"""Caption / text featurizers — JVM-side only (whole-stage codegen).

Graft of the reference's sort-key token parsing (``get_sort_key_input``,
tpch_utils_knob.py:156-168: split tokens, index into a fixed vocabulary,
one-hot/count) onto captions: per-row token count + per-vocab-word counts.

Also the training-data text-analysis layer (prompt requirement): language
ID (stopword-hit heuristic), quality scores (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex), and a
polynomial rolling-hash document fingerprint — each expressible in ANSI
SQL so the DuckDB oracle can verify them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from query_cost_feature_engineering_spark.sources.images import VOCAB

_TOKEN_SPLIT = r"\s+"


def with_caption_features(df: DataFrame, col: str = "caption") -> DataFrame:
    """token_count + one count column per vocabulary word (64)."""
    toks = F.split(F.col(col), _TOKEN_SPLIT)
    cols = {"token_count": F.size(toks).cast("double")}
    for w in VOCAB:
        cols[f"tok_{w}"] = F.size(
            F.filter(toks, lambda t: t == F.lit(w))
        ).cast("double")
    return df.withColumns(cols)


# Tiny public stopword lists per language for the n-gram/stopword language
# heuristic (fastText-style stopword voting, public technique).
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "dans", "pour"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
}


def _hits(col, words) -> F.Column:
    toks = F.split(F.lower(col), r"[^a-zà-ÿ]+")
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def with_text_analysis(df: DataFrame, col: str = "text") -> DataFrame:
    """language-ID, quality score, token counts, rolling-hash fingerprint."""
    c = F.col(col)
    for lang, words in _STOPWORDS.items():
        df = df.withColumn(f"hits_{lang}", _hits(c, words).cast("double"))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in _STOPWORDS])
    lang_expr = F.lit("unknown")
    for lang in reversed(list(_STOPWORDS)):
        lang_expr = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), lang
        ).otherwise(lang_expr)
    df = df.withColumn("lang_pred", lang_expr)

    df = (
        df.withColumn("n_chars_m", F.length(c).cast("double"))
        .withColumn(
            "ws_tokens", F.size(F.split(F.trim(c), _TOKEN_SPLIT)).cast("double")
        )
        .withColumn(
            # BPE-ish subword proxy: runs of letters, digits, or single symbols
            "bpe_tokens",
            F.size(
                F.filter(
                    F.split(c, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
                    lambda t: t != F.lit(""),
                )
            ).cast("double"),
        )
        .withColumn(
            "punct_ratio",
            F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double")
            / F.greatest(F.length(c).cast("double"), F.lit(1.0)),
        )
        .withColumn(
            "stop_ratio",
            F.col("hits_en") / F.greatest(F.col("ws_tokens"), F.lit(1.0)),
        )
        .withColumn(
            "quality_score",
            F.least(F.col("n_chars_m") / F.lit(200.0), F.lit(1.0)) * 0.4
            + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3
            + F.least(F.col("stop_ratio") * 3.0, F.lit(1.0)) * 0.3,
        )
    )

    # Polynomial rolling-hash fingerprint over the first 64 chars (Horner):
    # acc = (acc*31 + codepoint(s[i])) mod 2^31-1 — SQL-expressible fold.
    nchars = F.least(F.length(c), F.lit(64))
    df = df.withColumn(
        "fingerprint",
        F.when(F.length(c) == 0, F.lit(0).cast("long")).otherwise(
            F.aggregate(
                F.sequence(F.lit(1), F.greatest(nchars, F.lit(1))),
                F.lit(0).cast("long"),
                lambda acc, i: (acc * 31 + F.ascii(c.substr(i, F.lit(1))))
                % F.lit(2147483647),
            )
        ),
    )
    return df
