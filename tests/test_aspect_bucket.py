"""Aspect-ratio bucketing + batch packing (aspect_bucket_images).

The DuckDB oracle already pins the full output (independent VALUES-join
formulation); these tests pin the operator CONTRACT directly: every
kept batch is full and shape-uniform, hand-computed bucket assignments,
and the exact-arithmetic claim (integer cross products, one IEEE
divide) on crafted shapes.
"""

from __future__ import annotations

from collections import Counter

import pytest

from query_cost_feature_engineering_spark.queries import (
    ASPECT_BATCH,
    ASPECT_BUCKETS,
    aspect_bucket_images,
)


@pytest.fixture(scope="module")
def out_rows(spark):
    return aspect_bucket_images(spark, "unused").collect()


def test_kept_batches_are_full_and_uniform(out_rows):
    batches = Counter()
    bucket_of_batch = {}
    for r in out_rows:
        if not r["kept"]:
            continue
        key = (r["bucket_idx"], r["batch_id"])
        batches[key] += 1
        bucket_of_batch.setdefault(key, r["bucket"])
        assert r["bucket"] == bucket_of_batch[key]
    assert batches, "no full batches on a 400-image corpus"
    assert all(n == ASPECT_BATCH for n in batches.values())


def test_dropped_tail_is_exactly_the_partial_batch(out_rows):
    per_bucket = Counter(r["bucket_idx"] for r in out_rows)
    dropped = Counter(
        r["bucket_idx"] for r in out_rows if not r["kept"]
    )
    for b, n in per_bucket.items():
        assert dropped.get(b, 0) == n % ASPECT_BATCH


def test_hand_checked_assignments(out_rows):
    def expect(w, h):
        best = min(
            (max(w * bh, h * bw) / min(w * bh, h * bw), i)
            for i, (bw, bh) in enumerate(ASPECT_BUCKETS)
        )
        return best[1]

    for r in out_rows:
        assert r["bucket_idx"] == expect(r["w"], r["h"]), (
            r["image_id"],
            r["w"],
            r["h"],
        )
        bw, bh = ASPECT_BUCKETS[r["bucket_idx"]]
        assert r["bucket"] == f"{bw}:{bh}"
        if r["w"] == r["h"]:
            assert r["bucket_idx"] == 0  # square -> 1:1 exactly


def test_batch_ids_are_dense_per_bucket(out_rows):
    by_bucket: dict[int, list[int]] = {}
    for r in out_rows:
        by_bucket.setdefault(r["bucket_idx"], []).append(r["batch_id"])
    for ids in by_bucket.values():
        assert sorted(set(ids)) == list(range(max(ids) + 1))
