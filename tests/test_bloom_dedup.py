"""Bloom-filter reference dedup (bloom_dedup_docs).

Pins the two Bloom invariants the DuckDB oracle cannot see from the
outside: (1) NO false negatives — every probe line that IS in the
reference set is flagged (guaranteed by construction, asserted on a
planted corpus where the expected cross-set duplicates are known);
(2) zero false positives on the shipped corpora at the shipped m/k —
asserted by comparing the Bloom verdicts against an exact membership
join computed in the same Spark session (the sizing argument lives at
queries.BLOOM_M_BITS).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from query_cost_feature_engineering_spark.queries import (
    C4_LINE_WORDS,
    _bloom_lines,
    bloom_dedup_docs,
)


def _exact_verdicts(spark, sf_dir):
    """Ground truth via an exact join — no hashing anywhere."""
    lines = _bloom_lines(spark, sf_dir)
    ref = (
        lines.filter((F.col("doc_id") % 3 == 0) & F.col("line").isNotNull())
        .select("line")
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    return (
        lines.filter(F.col("doc_id") % 3 != 0)
        .join(ref, "line", "left")
        .groupBy("doc_id")
        .agg(
            F.count("line").cast("long").alias("n_lines"),
            F.sum(F.coalesce("_m", F.lit(0))).cast("long").alias("n_dup"),
        )
    )


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """A corpus with KNOWN cross-set duplicate passages: doc 0 (ref,
    0 % 3 == 0) and doc 1 (probe) share one verbatim 8-word line; doc 2
    (probe) is entirely novel text. Word choices avoid the md5
    boilerplate decoration changing the planted lines is NOT required —
    the exact-join ground truth applies the identical derivation, so
    whatever the decoration does, bloom must agree with it."""
    d = tmp_path_factory.mktemp("bloom_planted")
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    assert len(shared.split()) == C4_LINE_WORDS
    rows = []
    for i in range(30):
        if i == 1:
            text = shared + " " + " ".join(f"p{i}w{j}" for j in range(8))
        elif i % 3 == 0:
            text = shared + " " + " ".join(f"r{i}w{j}" for j in range(8))
        else:
            text = " ".join(f"n{i}w{j}" for j in range(16))
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": "en",
                "source": "t",
                "n_chars": len(text),
            }
        )
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def test_bloom_matches_exact_on_planted_corpus(spark, planted_dir):
    bloom = {
        r["doc_id"]: (r["n_lines"], r["n_dup_lines"])
        for r in bloom_dedup_docs(spark, planted_dir).collect()
    }
    exact = {
        r["doc_id"]: (r["n_lines"], r["n_dup"])
        for r in _exact_verdicts(spark, planted_dir).collect()
    }
    assert bloom == exact
    # the planted duplicate is real: doc 1's shared line (possibly
    # rewritten by the decoration — in that case some OTHER probe doc
    # hits the boilerplate) must make at least one probe doc dup > 0
    assert sum(d for _, d in bloom.values()) > 0


def test_bloom_no_false_negatives_and_zero_fp_sf0001(spark):
    sf = "/root/testdata/sf0.001"
    bloom = {
        r["doc_id"]: r["n_dup_lines"]
        for r in bloom_dedup_docs(spark, sf).collect()
    }
    exact = {
        r["doc_id"]: r["n_dup"] for r in _exact_verdicts(spark, sf).collect()
    }
    assert set(bloom) == set(exact)
    # >= exact everywhere would be the pure no-false-negative claim;
    # equality additionally pins zero false positives at the shipped m/k
    assert bloom == exact
    assert sum(exact.values()) > 0  # the corpus genuinely has dups


def test_bloom_kept_rule(spark):
    out = bloom_dedup_docs(spark, "/root/testdata/sf0.001").collect()
    for r in out:
        assert r["kept"] == (r["dup_frac"] <= 0.3)
        if r["n_lines"] == 0:
            assert r["n_dup_lines"] == 0 and r["dup_frac"] == 0.0


def test_bloom_deterministic(spark):
    a = sorted(
        map(tuple, bloom_dedup_docs(spark, "/root/testdata/sf0.001").collect())
    )
    b = sorted(
        map(tuple, bloom_dedup_docs(spark, "/root/testdata/sf0.001").collect())
    )
    assert a == b
