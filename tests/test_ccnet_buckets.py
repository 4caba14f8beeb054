"""CCNet perplexity bucketing (ccnet_buckets_docs).

The oracle pins the full output; these pin the CONTRACT: per-language
terciles are balanced (sizes differ by at most 1), score-ordered
(every head score >= every middle score >= every tail score, non-strict
because rounding ties may straddle a boundary), and kept == head|middle.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from query_cost_feature_engineering_spark.queries import ccnet_buckets_docs


@pytest.fixture(scope="module")
def rows(spark):
    return ccnet_buckets_docs(spark, "/root/testdata/sf0.001").collect()


def test_terciles_balanced_per_lang(rows):
    sizes = defaultdict(lambda: defaultdict(int))
    for r in rows:
        sizes[r["lang"]][r["tercile"]] += 1
    for lang, by_t in sizes.items():
        assert set(by_t) == {1, 2, 3}, lang
        ns = sorted(by_t.values())
        assert ns[-1] - ns[0] <= 1, (lang, by_t)


def test_terciles_score_ordered(rows):
    by = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by[r["lang"]][r["tercile"]].append(r["lm_score"])
    for lang, by_t in by.items():
        assert min(by_t[1]) >= max(by_t[2]) >= min(by_t[2]) >= max(by_t[3])


def test_kept_is_head_and_middle(rows):
    for r in rows:
        assert r["kept"] == (r["tercile"] <= 2)
        assert r["bucket"] == {1: "head", 2: "middle", 3: "tail"}[r["tercile"]]
