"""Sketch-profiling error bounds: approx_count_distinct (HLL++, rsd=0.05)
and percentile_approx vs the exact answers on the same input. Round 5:
approx_profile_orders now emits exact anchors + per-sketch bound
booleans and is DuckDB-oracled (the oracle hashes literal TRUEs); this
test keeps the tighter numeric error magnitudes pinned on the raw
sketches."""

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
    raw = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("o_custkey").alias("nd_c"),
        F.count_distinct("o_totalprice").alias("nd_t"),
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("a_c"),
        F.approx_count_distinct("o_totalprice", rsd=0.05).alias("a_t"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("ap50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("ap95"),
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "p50"
        ),
        F.expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "p95"
        ),
    ).first()
    # the oracled invariant columns must all hold
    assert row["n"] == raw["n"]
    assert row["custkey_nd_exact"] == raw["nd_c"]
    assert row["totalprice_nd_exact"] == raw["nd_t"]
    for flag in ("custkey_nd_ok", "totalprice_nd_ok", "p50_ok", "p95_ok"):
        assert row[flag] is True, flag
    # HLL++ rsd=0.05 → 3σ ≈ 15% relative error bound on the raw sketches
    for a, e in [(raw["a_c"], raw["nd_c"]), (raw["a_t"], raw["nd_t"])]:
        assert abs(a - e) / e <= 0.15, (a, e)
    # percentile_approx(accuracy=10000) on 15k rows: near-exact rank; the
    # returned value is an actual data value within a tight quantile band
    for a, e in [(raw["ap50"], raw["p50"]), (raw["ap95"], raw["p95"])]:
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
