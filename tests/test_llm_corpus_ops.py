"""Round-5 LLM-corpus operators: passage-level exact-substring dedup
(Lee et al. 2022), char-bigram language ID, and URL/domain dedup.

The oracle harness proves SQL parity; these tests pin the SEMANTICS on
hand-built fixtures (planted duplicate passages recovered exactly,
planted languages classified exactly, cap/blocklist arithmetic)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F

from query_cost_feature_engineering_spark.queries import (
    DOMAIN_BLOCKLIST,
    DOMAIN_CAP,
    LANGID_LANGS,
    LANGID_VOWEL_MAP,
    SPAN_NGRAM,
    domain_dedup_docs,
    lang_id_docs,
    span_dedup_docs,
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


def test_span_dedup_recovers_planted_passage_exactly(spark, tmp_path):
    """A 10-token passage planted in two docs at known offsets must come
    back as exactly one maximal span per doc — correct start, end, and
    shared-gram count (10 tokens ⇒ 6 overlapping 5-grams merged)."""
    passage = [f"dup{i}" for i in range(10)]
    doc1 = [f"a{i}" for i in range(20)] + passage + [f"b{i}" for i in range(10)]
    doc2 = [f"c{i}" for i in range(15)] + passage + [f"d{i}" for i in range(25)]
    # within-doc-only repetition: doc 3 repeats its own passage twice but
    # shares nothing with any other doc -> must emit NO span
    selfrep = [f"e{i}" for i in range(6)]
    doc3 = selfrep + [f"f{i}" for i in range(8)] + selfrep
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, " ".join(doc1), "en", "s"),
            (2, " ".join(doc2), "en", "s"),
            (3, " ".join(doc3), "en", "s"),
        ],
    )
    out = span_dedup_docs(spark, d).toPandas().sort_values("doc_id")
    got = [
        tuple(r)
        for r in out[
            ["doc_id", "span_start", "span_end", "span_tokens", "n_shared_grams"]
        ].itertuples(index=False)
    ]
    n_grams = 10 - SPAN_NGRAM + 1
    assert got == [
        (1, 20, 29, 10, n_grams),
        (2, 15, 24, 10, n_grams),
    ]


def test_span_dedup_splits_disjoint_passages(spark, tmp_path):
    """Two shared passages separated by a unique gap > the merge window
    must come back as two spans, not one."""
    p1 = [f"x{i}" for i in range(SPAN_NGRAM)]
    p2 = [f"y{i}" for i in range(SPAN_NGRAM)]
    gap = [f"g{i}" for i in range(SPAN_NGRAM + 2)]
    doc1 = p1 + gap + p2
    doc2 = p1 + [f"h{i}" for i in range(9)] + p2
    d = _write_docs(
        spark,
        tmp_path,
        [(1, " ".join(doc1), "en", "s"), (2, " ".join(doc2), "en", "s")],
    )
    out = span_dedup_docs(spark, d).toPandas()
    assert len(out) == 4  # two spans in each doc
    spans1 = sorted(
        out[out.doc_id == 1][["span_start", "span_end"]].itertuples(
            index=False, name=None
        )
    )
    assert spans1 == [
        (0, SPAN_NGRAM - 1),
        (2 * SPAN_NGRAM + 2, 3 * SPAN_NGRAM + 1),
    ]


def test_lang_id_vowel_maps_form_latin_square():
    """Every language maps every vowel differently from every other
    language — the property that guarantees the planted fixtures are
    linearly separable by char-bigram profiles."""
    maps = [LANGID_VOWEL_MAP[lg] for lg in LANGID_LANGS]
    for pos in range(5):
        col = [m[pos] for m in maps]
        assert len(set(col)) == len(maps)


def test_lang_id_classifies_all_testdata_docs(spark):
    out = lang_id_docs(spark, SF).toPandas()
    assert len(out) == 500
    assert out["correct"].all()
    assert set(out["pred_lang"]) == set(LANGID_LANGS)
    # one prediction per document, scores strictly negative (log-probs)
    assert out["doc_id"].is_unique
    assert (out["score"] < 0).all()


def test_domain_dedup_cap_blocklist_and_suffix(spark):
    out = domain_dedup_docs(spark, SF).toPandas()
    assert len(out) == 500
    # registered-domain extraction: multi-part public suffixes keep
    # three labels, everything else two; www. is stripped from host
    assert not out["host"].str.startswith("www.").any()
    couk = out[out.domain.str.endswith("co.uk")]
    assert (couk["domain"].str.count(r"\.") == 2).all()
    rest = out[~out.domain.str.endswith("co.uk")]
    assert (rest["domain"].str.count(r"\.") == 1).all()
    # blocklist: every blocked domain row is dropped regardless of rank
    blocked = out[out.domain.isin(DOMAIN_BLOCKLIST)]
    assert len(blocked) > 0 and blocked["blocked"].all()
    assert not blocked["kept"].any()
    # cap: kept rows per domain <= cap, and they are exactly the
    # lowest-doc_id rows (rank is dense 1..n by doc_id)
    for dom, g in out.groupby("domain"):
        g = g.sort_values("doc_id")
        assert list(g["domain_rank"]) == list(range(1, len(g) + 1))
        kept = g[g.kept]
        if dom not in DOMAIN_BLOCKLIST:
            assert len(kept) == min(len(g), DOMAIN_CAP)
            assert (kept["domain_rank"] <= DOMAIN_CAP).all()


def test_lang_id_train_split_matches_md5_contract():
    """The ~50% training split is the same deterministic md5 prefix rule
    the other split operators use (hash_split/contamination)."""
    n_train = sum(
        hashlib.md5(str(i).encode()).hexdigest()[:8] < "80000000"
        for i in range(500)
    )
    assert 200 < n_train < 300


# --- Round-5 #9: BPE-style token statistics --------------------------------


def _regex_bpe(word):
    """INDEPENDENT greedy longest-match reimplementation: a regex
    alternation of all pieces sorted longest-first (Python `re` picks
    the first matching alternative => longest match at each cursor),
    with `.` as the 1-char UNK fallback."""
    import re

    from query_cost_feature_engineering_spark.functions.text import BPE_VOCAB

    pieces = sorted(BPE_VOCAB, key=len, reverse=True)
    pat = re.compile("|".join(re.escape(p) for p in pieces) + "|.")
    toks = pat.findall(word)
    vocab = set(BPE_VOCAB)
    return len(toks), sum(1 for t in toks if t not in vocab)


def test_bpe_tokenizer_matches_independent_regex_engine():
    from query_cost_feature_engineering_spark.functions.text import (
        BPE_VOCAB,
        bpe_word_tokens,
    )

    # hand-pinned values: full-vocab words are 1 token; UNK chars count
    assert bpe_word_tokens("table") == (1, 0)
    assert bpe_word_tokens("window") == (1, 0)
    assert bpe_word_tokens("") == (0, 0)
    assert bpe_word_tokens("x7!") == (3, 2)  # 'x' known, '7' and '!' UNK
    # every vocab piece tokenizes to exactly itself
    for p in BPE_VOCAB:
        assert bpe_word_tokens(p) == (1, 0)
    # fuzz against the regex-engine reimplementation
    import numpy as np

    rng = np.random.default_rng(7)
    alphabet = list("abcdefghijklmnopqrstuvwxyz0123456789-")
    for _ in range(500):
        w = "".join(rng.choice(alphabet, size=rng.integers(0, 20)))
        assert bpe_word_tokens(w) == _regex_bpe(w), w


def test_token_stats_feed_pack_sequences_parity(spark):
    """VERDICT r4 #9 'done' bar: packing runs on REAL tokenizer lengths.
    The distributed range-bucket prefix sum over n_bpe_tokens must equal
    a single-process pandas cumsum recompute bit-exactly."""
    from query_cost_feature_engineering_spark.functions.text import (
        bpe_word_tokens,
    )
    from query_cost_feature_engineering_spark.operators.prefix import (
        with_running_sums,
    )
    from query_cost_feature_engineering_spark.queries import (
        PACK_CONTEXT_LEN,
        token_stats_docs,
    )

    stats = token_stats_docs(spark, SF).select("doc_id", "n_bpe_tokens")
    packed = (
        with_running_sums(
            stats, ["doc_id"], ["n_bpe_tokens"],
            bucket_col="doc_id", min_buckets=8,
        )
        .withColumn(
            "seq_id",
            F.expr(
                f"(run_n_bpe_tokens - n_bpe_tokens) DIV {PACK_CONTEXT_LEN}"
            ),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # independent recompute: tokenize every doc single-process
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_bpe = docs["text"].map(
        lambda t: sum(bpe_word_tokens(w)[0] for w in t.split(" "))
    )
    assert list(packed["n_bpe_tokens"]) == list(n_bpe)
    cum = n_bpe.cumsum() - n_bpe  # exclusive prefix
    assert list(packed["run_n_bpe_tokens"] - packed["n_bpe_tokens"]) == list(cum)
    assert list(packed["seq_id"]) == list(cum // PACK_CONTEXT_LEN)
