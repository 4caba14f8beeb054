"""Corpus-pipeline capstone (corpus_pipeline_docs).

The composed oracle pins the output; these pin the COMPOSITION
contract: each verdict column equals its standalone query's verdict,
kept is their conjunction, and shard/shard_pos exist exactly for kept
docs with dense per-shard positions.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from query_cost_feature_engineering_spark.queries import (
    PIPELINE_GOPHER_MIN_STOPWORDS,
    PIPELINE_GOPHER_MIN_WORDS,
    c4_clean_docs,
    corpus_pipeline_docs,
    gopher_quality_docs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows(spark):
    return corpus_pipeline_docs(spark, SF).collect()


def test_verdicts_match_standalone_queries(spark, rows):
    gq = {
        r["doc_id"]: r["passes"]
        for r in gopher_quality_docs(
            spark,
            SF,
            min_words=PIPELINE_GOPHER_MIN_WORDS,
            min_stopwords=PIPELINE_GOPHER_MIN_STOPWORDS,
        ).collect()
    }
    c4 = {r["doc_id"]: r["page_kept"] for r in c4_clean_docs(spark, SF).collect()}
    assert len(rows) == len(gq) == len(c4)
    for r in rows:
        assert r["gopher_ok"] == gq[r["doc_id"]]
        assert r["c4_ok"] == c4[r["doc_id"]]
        assert r["kept"] == (
            r["gopher_ok"] and r["c4_ok"] and r["is_canonical"]
        )


def test_shards_only_for_kept_and_dense(rows):
    by_shard = defaultdict(list)
    n_kept = 0
    for r in rows:
        if r["kept"]:
            n_kept += 1
            assert r["shard"] is not None and r["shard_pos"] is not None
            by_shard[r["shard"]].append(r["shard_pos"])
        else:
            assert r["shard"] is None and r["shard_pos"] is None
    assert n_kept > 0 and len(by_shard) > 1
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
