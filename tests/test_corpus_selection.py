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


def _c4_expected(rows):
    """Independent pure-Python recompute of c4_clean_docs: hashlib.md5
    decoration (vs Spark's F.md5), Python string gates (vs JVM
    expressions), dict-based global first-occurrence dedup (vs the
    min-struct groupBy + join)."""
    import hashlib

    from query_cost_feature_engineering_spark.queries import (
        C4_BOILER,
        C4_LINE_WORDS,
        C4_LOREM,
        C4_MIN_LINE_WORDS,
        C4_MIN_LINES,
    )

    out, pages, cands = {}, {}, []
    for doc_id, text in rows:
        ws = [w for w in text.lower().split(" ") if w]
        n = len(ws) // C4_LINE_WORDS
        if n == 0:
            out[doc_id] = (0, 0, 0, 0, False)
            continue
        lines = []
        for i in range(n):
            base = " ".join(ws[i * C4_LINE_WORDS:(i + 1) * C4_LINE_WORDS])
            h = hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()
            if h[0] == "0" and h[1] == "0":
                line = C4_LOREM
            elif h[0] == "0" and h[1] == "1":
                line = base + " {"
            elif h[0] == "1":
                line = "javascript " + base + ("." if h[2] < "c" else "")
            elif h[0] in "23":
                line = C4_BOILER[0] if h[1] < "8" else C4_BOILER[1]
            else:
                line = base + ("." if h[2] < "c" else "")
            kept = (
                line.endswith(".")
                and len([w for w in line.split(" ") if w])
                >= C4_MIN_LINE_WORDS
                and "javascript" not in line
            )
            lines.append((i, line, kept))
        kept_n = sum(1 for _, _, k in lines if k)
        page = (
            not any("lorem ipsum" in l for _, l, _ in lines)
            and not any("{" in l for _, l, _ in lines)
            and kept_n >= C4_MIN_LINES
        )
        pages[doc_id] = (n, kept_n, page)
        if page:
            cands += [(l, doc_id, i) for i, l, k in lines if k]
    first, dup = {}, {}
    for line, d_, i in sorted(cands, key=lambda t: (t[1], t[2])):
        if line in first:
            dup[d_] = dup.get(d_, 0) + 1
        else:
            first[line] = (d_, i)
    for d_, (n, k, p) in pages.items():
        dr = dup.get(d_, 0)
        out[d_] = (n, k, dr, (k - dr) if p else 0, p)
    return out


def test_c4_clean_matches_independent_recompute(spark, tmp_path):
    """Full parity on a 48-doc seeded corpus sized so the fixture
    organically exercises EVERY path: boilerplate cross-doc duplicates
    (dup_removed > 0), lorem/brace page kills, javascript line kills,
    no-terminal-punct line drops, kept pages, and a < 8-word doc."""
    import random

    from query_cost_feature_engineering_spark.queries import c4_clean_docs

    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(30)]
    rows = []
    for d_ in range(48):
        n_words = rng.randrange(0, 220)
        rows.append(
            (d_, " ".join(rng.choice(vocab) for _ in range(n_words)),
             "en", "web")
        )
    exp = _c4_expected([(d_, t) for d_, t, _, _ in rows])
    # the seed must produce a fixture with every path live
    assert sum(e[2] for e in exp.values()) > 0, "no organic dups"
    assert any(not e[4] and e[0] > 0 for e in exp.values())
    assert any(e[4] for e in exp.values())
    assert any(e[0] == 0 for e in exp.values())
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (
            r["n_lines"], r["kept_lines"], r["dup_removed"],
            r["final_lines"], r["page_kept"],
        )
        for r in c4_clean_docs(spark, d).collect()
    }
    assert got == exp


def test_c4_clean_page_killers_are_exact(spark, tmp_path):
    """Deterministically planted killers: scanning doc_id space for a
    doc whose md5 decoration places a lorem line (page dropped even
    though every other line is clean) and one with a brace line."""
    import hashlib

    from query_cost_feature_engineering_spark.queries import (
        C4_LINE_WORDS,
        c4_clean_docs,
    )

    def first_doc_with(prefix, n_lines=6):
        d_ = 0
        while True:
            hs = [
                hashlib.md5(f"{d_}:{i}".encode()).hexdigest()
                for i in range(n_lines)
            ]
            if any(h.startswith(prefix) for h in hs):
                return d_
            d_ += 1

    lorem_doc = first_doc_with("00")
    brace_doc = first_doc_with("01")
    text = " ".join(f"t{j}" for j in range(6 * C4_LINE_WORDS))
    rows = [(lorem_doc, text, "en", "web")]
    if brace_doc != lorem_doc:
        rows.append((brace_doc, text, "en", "web"))
    d = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in c4_clean_docs(spark, d).collect()}
    for d_ in (lorem_doc, brace_doc):
        assert out[d_]["page_kept"] is False
        assert out[d_]["final_lines"] == 0
        assert out[d_]["n_lines"] == 6
