"""Fixed-shape vision-language packing (vlm_pack_images).

The DuckDB oracle pins the full output; these tests pin the CONTRACT:
every kept context is exactly full (512 // q slots, dense slot ids),
its true token cost fits the 512 budget (the quantization guarantee),
and the dropped tail is exactly the partial context per quantum.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from query_cost_feature_engineering_spark.queries import (
    VLM_CTX,
    VLM_IMG_TOKENS,
    vlm_pack_images,
)


@pytest.fixture(scope="module")
def rows(spark):
    return vlm_pack_images(spark, "unused").collect()


def test_costs_and_quanta(rows):
    for r in rows:
        assert r["n_tokens"] > VLM_IMG_TOKENS  # every caption non-empty
        assert r["q"] in (64, 128, 256, VLM_CTX)
        assert r["q"] >= r["n_tokens"]
        assert r["q"] // 2 < r["n_tokens"]  # tightest power of two


def test_kept_contexts_full_dense_and_within_budget(rows):
    ctxs = defaultdict(list)
    for r in rows:
        if r["kept"]:
            ctxs[(r["q"], r["ctx_idx"])].append(r)
    assert ctxs, "no full contexts on a 400-image corpus"
    for (q, _), members in ctxs.items():
        per_ctx = VLM_CTX // q
        assert len(members) == per_ctx
        assert sorted(m["slot"] for m in members) == list(range(per_ctx))
        assert sum(m["n_tokens"] for m in members) <= VLM_CTX


def test_dropped_tail_is_partial_context(rows):
    per_q = defaultdict(int)
    dropped = defaultdict(int)
    for r in rows:
        per_q[r["q"]] += 1
        if not r["kept"]:
            dropped[r["q"]] += 1
    for q, n in per_q.items():
        assert dropped.get(q, 0) == n % (VLM_CTX // q)
