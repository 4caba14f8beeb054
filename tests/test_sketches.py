"""Sketch-profiling error bounds: approx_count_distinct (HLL++, rsd=0.05)
and percentile_approx vs the exact answers on the same input. The driver
records approx_profile_orders rows-only (sketches are engine-specific);
this test is the correctness evidence."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.01"


def test_sketch_error_bounds(spark):
    from query_cost_feature_engineering_spark.queries import (
        approx_profile_orders,
    )
    from pyspark.sql import functions as F

    row = approx_profile_orders(spark, SF_DIR).first()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("o_custkey").alias("nd_c"),
        F.count_distinct("o_totalprice").alias("nd_t"),
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "p50"
        ),
        F.expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "p95"
        ),
    ).first()
    assert row["n"] == exact["n"]
    # HLL++ rsd=0.05 → 3σ ≈ 15% relative error bound
    for a, e in [
        (row["custkey_approx_nd"], exact["nd_c"]),
        (row["totalprice_approx_nd"], exact["nd_t"]),
    ]:
        assert abs(a - e) / e <= 0.15, (a, e)
    # percentile_approx(accuracy=10000) on 15k rows: near-exact rank; the
    # returned value is an actual data value within a tight quantile band
    for a, e in [(row["p50_totalprice"], exact["p50"]), (row["p95_totalprice"], exact["p95"])]:
        assert abs(a - e) / abs(e) <= 0.02, (a, e)


def test_chunking_reconstructs_documents(spark):
    """Non-overlap parts of consecutive chunks concatenate back to the
    original token stream; chunk sizes and counts obey the stride math."""
    from query_cost_feature_engineering_spark.queries import chunk_documents
    from pyspark.sql import functions as F

    chunks = chunk_documents(spark, SF_DIR).toPandas()
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    toks = {r.doc_id: [t for t in r.text.split() if t] for r in docs.itertuples()}
    grouped = chunks.sort_values(["doc_id", "chunk_idx"]).groupby("doc_id")
    seen = 0
    for doc_id, g in grouped:
        tk = toks[doc_id]
        n = len(tk)
        expect_chunks = max(-(-(n - 32) // 24), 0) + 1 if n else 0
        assert len(g) == expect_chunks, doc_id
        for r in g.itertuples():
            start = r.chunk_idx * 24
            want = tk[start : start + 32]
            assert r.chunk_text.split() == want
            assert r.n_tokens == len(want)
        seen += 1
    assert seen == len(toks)
