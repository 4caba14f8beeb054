"""Feature-engineering ops added beyond the reference: hashing-trick
vectorizer, robust (median/MAD) outlier flagging, per-entity EWMA."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from query_cost_feature_engineering_spark.queries import (
    ewma_events,
    feature_hash_events,
    outlier_events_robust,
)

SF = "/root/testdata/sf0.001"


def test_feature_hash_width_constant_and_counts_conserve(spark):
    out = feature_hash_events(spark, SF)
    # vector width is fixed by construction: 8 count + 8 weighted cols
    assert [c for c in out.columns if c.startswith("h")] == [
        f"h{i}" for i in range(8)
    ]
    # bucket counts per user must sum to the user's event count
    total = out.select(
        "user_id",
        sum(F.col(f"h{i}") for i in range(8)).alias("n"),
    )
    events = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bad = (
        total.join(events, "user_id")
        .filter(F.col("n") != F.col("n_events"))
        .count()
    )
    assert bad == 0


def test_feature_hash_is_deterministic(spark):
    a = feature_hash_events(spark, SF).orderBy("user_id").collect()
    b = feature_hash_events(spark, SF).orderBy("user_id").collect()
    assert a == b


def test_outlier_flag_shift_invariant(spark, tmp_path):
    """median/MAD z is shift-invariant: adding a constant to every value
    must flag the SAME events."""
    base = {r.event_id for r in outlier_events_robust(spark, SF).collect()}
    assert base, "fixture must contain robust outliers"

    d = str(tmp_path / "sf_shift")
    import os

    os.makedirs(d)
    e = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    e.write.parquet(f"{d}/events.parquet")
    shifted = {r.event_id for r in outlier_events_robust(spark, d).collect()}
    assert shifted == base


def test_outlier_all_rows_exceed_threshold(spark):
    out = outlier_events_robust(spark, SF)
    assert out.filter(F.col("robust_z") <= 3.5).count() == 0


def test_ewma_matches_sequential_reference(spark):
    out = ewma_events(spark, SF).toPandas()
    e = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )
    got = out.set_index("event_id")["ewma"]
    for uid, g in e.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        x = g["value"].to_numpy()
        y = np.empty_like(x)
        y[0] = x[0]
        for i in range(1, len(x)):
            y[i] = 0.7 * y[i - 1] + 0.3 * x[i]
        want = np.round(y + 1e-9, 4)
        np.testing.assert_allclose(
            got.loc[g["event_id"]].to_numpy(), want, atol=1e-9,
            err_msg=f"user {uid}",
        )


def test_ewma_single_event_user_identity(spark, tmp_path):
    """A user with one event gets ewma == value (recurrence base case)."""
    d = str(tmp_path / "sf_one")
    import os

    os.makedirs(d)
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00",
                    "2024-01-01 01:00",
                    "2024-01-01 02:00",
                ]
            ),
            "user_id": [7, 8, 8],
            "event_type": ["view"] * 3,
            "value": [5.0, 1.0, 3.0],
            "props": ["{}"] * 3,
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{d}/events.parquet")
    out = {
        r.event_id: r.ewma for r in ewma_events(spark, d).collect()
    }
    assert out[1] == 5.0
    assert out[2] == 1.0
    assert abs(out[3] - round(0.7 * 1.0 + 0.3 * 3.0 + 1e-9, 4)) < 1e-12


def test_contamination_pairs_are_cross_side_and_thresholded(spark):
    from query_cost_feature_engineering_spark.queries import (
        contamination_docs,
    )

    out = contamination_docs(spark, SF).toPandas()
    assert len(out) > 0
    assert (out["jaccard"] >= 0.5).all()

    import hashlib

    def is_bench(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()[:8] < "19999999"

    # orientation: train side never in bench split, bench side always
    assert not out["train_doc"].map(is_bench).any()
    assert out["bench_doc"].map(is_bench).all()


def test_weighted_sample_rate_tracks_probability(spark):
    from query_cost_feature_engineering_spark.queries import (
        weighted_sample_docs,
    )

    out = weighted_sample_docs(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n, kept = docs.count(), out.count()
    expected = docs.select(
        F.sum(
            F.least(F.length("text") / F.lit(400.0) + F.lit(0.1), F.lit(1.0))
        )
    ).first()[0]
    # md5 acceptance is uniform, so the realized rate concentrates near
    # the summed probabilities (±10% slack for the 500-doc corpus)
    assert abs(kept - expected) / n < 0.10
    # determinism: same rows both runs
    again = weighted_sample_docs(spark, SF)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_lm_quality_scores_orderly(spark):
    """Bigram-LM quality scoring: a document made of the corpus's most
    common pattern scores higher (less negative) than one of
    never-repeated bigrams, and the score is deterministic."""
    import pandas as pd
    from pyspark.sql import functions as F

    from query_cost_feature_engineering_spark.queries import lm_quality_docs

    sf = "/root/testdata/sf0.001"
    a = lm_quality_docs(spark, sf).toPandas().set_index("doc_id")
    b = lm_quality_docs(spark, sf).toPandas().set_index("doc_id")
    pd.testing.assert_frame_equal(a.sort_index(), b.sort_index())
    assert (a["n_bigrams"] >= 1).all()
    assert (a["lm_score"] < 0).all()  # log-probs are negative
    # spread exists: the corpus separates docs (not a constant column)
    assert a["lm_score"].nunique() > 10
