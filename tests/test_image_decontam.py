"""Image benchmark decontamination (image_decontam_phash).

The DuckDB oracle brute-forces the full train × bench hamming join;
these tests pin the banding-vs-brute equivalence on adversarial hashes
and the planted-leak recovery contract.
"""

from __future__ import annotations

import pandas as pd

from query_cost_feature_engineering_spark.codecs import hamming64
from query_cost_feature_engineering_spark.operators.neardup import (
    hamming_cross_pairs,
)
from query_cost_feature_engineering_spark.sources.images import (
    generate_decontam_corpus_pandas,
)


def test_cross_banding_equals_brute_force(spark):
    # adversarial: hashes straddling the <=8 boundary on every band mix
    import numpy as np

    rng = np.random.default_rng(9)
    base = int(rng.integers(-(2**62), 2**62))
    left = []
    for i in range(40):
        flip = int(rng.integers(0, 12))  # 0..11 bit flips
        v = base
        for b in rng.choice(64, size=flip, replace=False):
            v ^= 1 << int(b)
        left.append((f"l{i:03d}", v - (1 << 64) if v >= 1 << 63 else v))
    right = [("r000", base), ("r001", ~base & (2**63 - 1))]
    ldf = spark.createDataFrame(left, "image_id string, phash long")
    rdf = spark.createDataFrame(right, "image_id string, phash long")
    got = {
        (r.image_id_a, r.image_id_b, r.hamming)
        for r in hamming_cross_pairs(
            ldf, rdf, "image_id", "phash", max_dist=8
        ).collect()
    }
    want = {
        (li, ri, hamming64(lv, rv))
        for li, lv in left
        for ri, rv in right
        if hamming64(lv, rv) <= 8
    }
    assert got == want and len(want) > 0


def test_planted_leaks_all_recovered(spark):
    from query_cost_feature_engineering_spark.queries import (
        image_decontam_phash,
    )

    rows = image_decontam_phash(spark, "unused").collect()
    pdf = generate_decontam_corpus_pandas(300, 44)
    planted = {
        (r["image_id"], r["leak_of"])
        for _, r in pdf.iterrows()
        if r["leak_of"] is not None
    }
    got = {(r.train_id, r.bench_id) for r in rows}
    assert planted <= got
    for r in rows:
        if (r.train_id, r.bench_id) in planted:
            assert r.is_planted and r.hamming == 0
