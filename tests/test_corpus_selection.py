"""Round-5 corpus-selection operators: Gopher quality rules (Rae et al.
2021), deterministic shard shuffle, SemDeDup (Abbas et al. 2023), and
DSIR importance weights (Xie et al. 2023).

The oracle harness proves SQL parity; these tests pin the SEMANTICS on
hand-built fixtures (planted pathological docs flagged, planted
semantic duplicates dropped, target-like docs up-weighted)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from query_cost_feature_engineering_spark.queries import (
    DSIR_TARGET_SOURCE,
    GOPHER_STOPWORDS,
    SEMDEDUP_TAU,
    SHUFFLE_SHARDS,
    dsir_weights_docs,
    gopher_quality_docs,
    semdedup_embeddings,
    shard_shuffle_docs,
)

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "docs")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    return d


def _write_embeddings(spark, tmp_path, vecs):
    d = str(tmp_path / "emb")
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{d}/embeddings.parquet"
    )
    return d


def test_gopher_rules_flag_planted_pathologies(spark, tmp_path):
    """One doc per published failure mode, plus one that passes all."""
    good = " ".join(
        (GOPHER_STOPWORDS * 10 + ["quality", "words", "here"] * 10)[:80]
    )
    short = "the of and that"  # < 50 words
    longwords = " ".join(["x" * 15] * 60)  # mean word length > 10
    nostops = " ".join(["zebra", "quark", "maple"] * 20)  # no stopwords
    symbols = " ".join(["the", "of", "with", "####"] * 15 + ["#"] * 12)
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, good, "en", "s"),
            (2, short, "en", "s"),
            (3, longwords, "en", "s"),
            (4, nostops, "en", "s"),
            (5, symbols, "en", "s"),
        ],
    )
    out = (
        gopher_quality_docs(spark, d)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[1, "passes"])
    assert not bool(out.loc[2, "passes"]) and out.loc[2, "word_count"] < 50
    assert not bool(out.loc[3, "passes"]) and out.loc[3, "mean_word_len"] > 10
    assert not bool(out.loc[4, "passes"]) and out.loc[4, "stopword_hits"] < 2
    assert (
        not bool(out.loc[5, "passes"])
        and out.loc[5, "symbol_ratio"] > 0.1
    )


def test_gopher_metrics_ranges_on_testdata(spark):
    out = gopher_quality_docs(spark, SF).toPandas()
    assert len(out) == 500 and out["doc_id"].is_unique
    assert (out["word_count"] > 0).all()
    assert out["frac_alpha_words"].between(0, 1).all()
    assert (out["stopword_hits"] <= len(GOPHER_STOPWORDS)).all()
    # clean synthetic prose: no symbols, every word alphabetic — but the
    # generator vocabulary carries only ONE Gopher stopword ("the"), so
    # the stopword rule rejects the whole corpus. Verify the verdict is
    # exactly the conjunction of the published rules on the emitted
    # metrics (boundaries here are far from the rounding epsilon).
    assert (out["symbol_ratio"] == 0).all()
    assert (out["frac_alpha_words"] == 1).all()
    expect = (
        out["word_count"].between(50, 100_000)
        & out["mean_word_len"].between(3, 10)
        & (out["stopword_hits"] >= 2)
    )
    assert (out["passes"] == expect).all()
    assert (out["stopword_hits"] <= 1).all() and not out["passes"].any()


def test_shard_shuffle_is_balanced_dense_and_deterministic(spark):
    out = shard_shuffle_docs(spark, SF).toPandas()
    assert len(out) == 500 and out["doc_id"].is_unique
    # every shard's positions are dense 1..n
    for _, g in out.groupby("shard"):
        assert sorted(g["shard_pos"]) == list(range(1, len(g) + 1))
    # uniform hash -> no shard more than 3x the mean at n=500
    sizes = out.groupby("shard").size()
    assert set(out["shard"]) == set(range(SHUFFLE_SHARDS))
    assert sizes.max() <= 3 * sizes.mean()
    # round-robin interleave is injective and consistent
    assert out["global_pos"].is_unique
    assert (
        out["global_pos"]
        == (out["shard_pos"] - 1) * SHUFFLE_SHARDS + out["shard"]
    ).all()
    again = shard_shuffle_docs(spark, SF).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )


def test_semdedup_drops_planted_duplicates_keeps_first(spark, tmp_path):
    """Three copies of one direction + two orthogonal singletons: the
    copies collapse to the smallest vec_id; singletons survive."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=64)
    ortho1, ortho2 = np.zeros(64), np.zeros(64)
    ortho1[0], ortho2[1] = 1.0, 1.0
    # vec 0,1,2 near-identical; 3 and 4 orthogonal to everything
    vecs = [base, base * 1.01, base * 0.98, ortho1, ortho2]
    d = _write_embeddings(spark, tmp_path, vecs)
    out = (
        semdedup_embeddings(spark, d)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert bool(out.loc[0, "kept"])  # first copy survives
    assert not bool(out.loc[1, "kept"]) and not bool(out.loc[2, "kept"])
    assert out.loc[1, "max_prior_cos"] >= SEMDEDUP_TAU
    assert out.loc[2, "n_prior_dups"] == 2  # both earlier copies matched
    assert bool(out.loc[3, "kept"]) and bool(out.loc[4, "kept"])
    # duplicates share one cell (cosine 1 with each other's anchor view)
    assert out.loc[0, "cell"] == out.loc[1, "cell"] == out.loc[2, "cell"]


def test_semdedup_keeps_everything_on_testdata_below_tau(spark):
    """The synthetic embeddings are near-isotropic; verdicts must be
    internally consistent: dropped <=> a prior same-cell mate >= tau."""
    out = semdedup_embeddings(spark, SF).toPandas()
    assert len(out) == 500 and out["vec_id"].is_unique
    dropped = out[~out.kept]
    assert (dropped["max_prior_cos"] >= SEMDEDUP_TAU).all()
    assert (dropped["n_prior_dups"] >= 1).all()
    kept = out[out.kept]
    assert kept["max_prior_cos"].isna().all()
    assert (kept["n_prior_dups"] == 0).all()


def test_dsir_upweights_target_like_docs(spark, tmp_path):
    """Docs written in the target slice's vocabulary must score strictly
    higher than docs written in the off-target vocabulary."""
    tgt_text = " ".join(["alpha", "beta", "gamma"] * 20)
    off_text = " ".join(["omega", "sigma", "delta"] * 20)
    rows = []
    for i in range(10):
        rows.append((i, tgt_text, "en", DSIR_TARGET_SOURCE))
    for i in range(10, 20):
        rows.append((i, off_text, "en", "srcX"))
    # probes: one target-like, one off-target doc OUTSIDE the slices
    rows.append((100, tgt_text, "en", "srcProbe"))
    rows.append((101, off_text, "en", "srcProbe"))
    d = _write_docs(spark, tmp_path, rows)
    out = dsir_weights_docs(spark, d).toPandas().set_index("doc_id")
    assert out.loc[100, "dsir_logratio"] > out.loc[101, "dsir_logratio"]
    assert out.loc[100, "dsir_logratio"] > 0  # target-like: p_tgt > p_raw
    assert out.loc[101, "dsir_logratio"] < 0
    assert (out["n_tokens"] == 60).all()


def test_dsir_weights_on_testdata(spark):
    out = dsir_weights_docs(spark, SF).toPandas()
    assert len(out) == 500 and out["doc_id"].is_unique
    # the synthetic corpus shares one vocabulary across sources, so the
    # weights carry only the constant add-one-smoothing offset (the
    # target slice is small vs DSIR_BUCKETS) plus per-doc noise: finite,
    # tightly clustered, no doc an outlier
    assert np.isfinite(out["dsir_logratio"]).all()
    assert out["dsir_logratio"].std() < 0.5
    spread = out["dsir_logratio"].max() - out["dsir_logratio"].min()
    assert spread < 1.0


def test_bpe_train_recovers_planted_merges(spark, tmp_path):
    """Hand-derived merge sequence on a tiny corpus (ties included:
    ranks 4-8 all have pair_freq 3 and resolve purely by the (left,
    right) lexicographic tie-break)."""
    from query_cost_feature_engineering_spark.queries import bpe_train_docs

    rows = [
        (0, "the cat sat on the mat the cat", "en", "src0"),
        (1, "low lower lowest low low", "en", "src0"),
        (2, "newer new newest wider wide", "en", "src0"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = [tuple(r) for r in bpe_train_docs(spark, d).collect()]
    assert out[:8] == [
        (1, "l", "o", "lo", 5),
        (2, "lo", "w", "low", 5),
        (3, "a", "t", "at", 4),
        (4, "e", "r", "er", 3),
        (5, "e", "w", "ew", 3),
        (6, "h", "e", "he", 3),
        (7, "n", "ew", "new", 3),
        (8, "t", "he", "the", 3),
    ]


def test_bpe_train_invariants_on_testdata(spark):
    """Ranks contiguous from 1, merged = left||right, and the winning
    pair count is non-increasing in rank (a new pair (x, ab) can occur
    at most count(a,b) times, and count(a,b) was the running max)."""
    from query_cost_feature_engineering_spark.queries import (
        BPE_TRAIN_MERGES,
        bpe_train_docs,
    )

    out = bpe_train_docs(spark, SF).toPandas()
    assert list(out["merge_rank"]) == list(range(1, len(out) + 1))
    assert len(out) <= BPE_TRAIN_MERGES
    assert (out["left_piece"] + out["right_piece"] == out["merged"]).all()
    assert (out["pair_freq"].diff().dropna() <= 0).all()
    # learned pieces feed greedy inference: every merged piece is a-z
    assert out["merged"].str.fullmatch("[a-z]+").all()
