"""Scale-safe near-duplicate joins — no cross join, no all-pairs.

Three candidate-generation schemes, each an equi-join on a derived key
(the only join shape that survives 10^12 rows), with exact verification
after:

* ``hamming_neardup_pairs`` — multi-index hamming banding: split the
  B-bit hash into ``max_dist + 1`` bands; by pigeonhole, two hashes
  within hamming distance ``max_dist`` agree EXACTLY on at least one
  band, so the equi-join on (band_idx, band_value) is lossless. Exact
  ``bit_count(xor)`` verification after. Output is identical to the
  cross-join formulation (golden-tested), plan is a hash join.
  This mirrors the reference's use of index identity one-hots
  (tpch_utils_knob.py:70-73) as exact-match keys.

* ``jaccard_pairs_prefix`` — exact set-similarity join via prefix
  filtering (the public SSJoin/AllPairs scheme): Jaccard(a,b) >= t
  implies |a∩b| >= ceil(t·|x|) for BOTH sets (union >= each set), and
  two sets with overlap >= α share an element within their first
  ``|x| - α + 1`` elements under any shared total order. So each set
  indexes only its md5-ordered prefix; candidates = equi-join on
  (block, token); exact Jaccard verified on the candidate pairs.
  Output identical to the all-pairs formulation.

* ``srp_candidate_pairs`` — embedding near-dup candidates via the same
  signed-random-projection LSH as operators/ann.py (one equi-join on
  (table, bucket)), exact cosine verification after. Unlike the two
  above, LSH recall < 1 by construction; the DuckDB oracle mirrors the
  identical candidate generation so the contract is deterministic, and
  recall against brute force is measured in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from query_cost_feature_engineering_spark.operators.ann import (
    ANN_BITS,
    ANN_DIM,
    ANN_TABLES,
    with_bucket_keys,
)


def band_layout(bits: int, max_dist: int) -> list[tuple[int, int]]:
    """(shift, width) per band: ``max_dist + 1`` near-equal slices."""
    n_bands = max_dist + 1
    base, extra = divmod(bits, n_bands)
    layout, shift = [], 0
    for i in range(n_bands):
        width = base + (1 if i < extra else 0)
        layout.append((shift, width))
        shift += width
    return layout


def hamming_neardup_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int = 64,
    max_dist: int = 12,
) -> DataFrame:
    """Pairs (id_a < id_b) with hamming(hash_a, hash_b) <= max_dist.

    Exact — the banding is a lossless candidate filter (pigeonhole).
    Plan: posexplode to (band, value) -> ONE shuffle equi-join ->
    bit_count verify. Hashes ride along (8 bytes), so no re-join.
    """
    bands = band_layout(bits, max_dist)
    band_vals = F.array(
        *[
            F.shiftrightunsigned(F.col(hash_col), s).bitwiseAND(
                F.lit((1 << w) - 1)
            )
            for s, w in bands
        ]
    )
    e = df.select(
        F.col(id_col), F.col(hash_col), F.posexplode(band_vals).alias("_band", "_bv")
    )
    a = e.select(
        F.col(id_col).alias("_id_a"), F.col(hash_col).alias("_h_a"), "_band", "_bv"
    )
    b = e.select(
        F.col(id_col).alias("_id_b"), F.col(hash_col).alias("_h_b"), "_band", "_bv"
    )
    return (
        a.join(b, ["_band", "_bv"])
        .filter(F.col("_id_a") < F.col("_id_b"))
        .select(
            F.col("_id_a").alias(f"{id_col}_a"),
            F.col("_id_b").alias(f"{id_col}_b"),
            F.bit_count(F.col("_h_a").bitwiseXOR(F.col("_h_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
        .distinct()
    )


def jaccard_pairs_prefix(
    docs: DataFrame,
    id_col: str,
    set_col: str,
    threshold: float,
    block_col: str | None = None,
) -> DataFrame:
    """Exact Jaccard-similarity join: pairs (a < b) with jac >= threshold.

    The AllPairs/SSJoin candidate scheme, complete by construction:

    * canonical order = ascending DOCUMENT FREQUENCY (ties by token).
      Any shared total order keeps the prefix theorem valid; df-ascending
      additionally pushes stopword-grade tokens out of prefixes, which is
      what collapses the candidate count (md5 order left ~2000-doc tokens
      in prefixes at sf0.1 → 277M candidate rows; df order prunes them).
    * prefix length |x| - ceil(t·|x|) + 1 per set.
    * size filter: jac >= t forces t·|a| <= |b| <= |a|/t, applied in the
      candidate join (sizes ride with the prefix tokens).
    * exact ``array_intersect/array_union`` verification on candidates.

    ``block_col`` (e.g. language) partitions the key space; the df order
    is computed per block (pairs never cross blocks, so the order is
    shared where it matters). Returns (id_a, id_b, jac) with exactly the
    same rows as the O(N^2) plan (golden-tested).
    """
    blocks = [block_col] if block_col else []
    ex = docs.select(
        F.col(id_col), *[F.col(c) for c in blocks],
        F.explode(set_col).alias("_tok"),
    )
    dfreq = ex.groupBy(*blocks, "_tok").agg(F.count(F.lit(1)).alias("_df"))
    ranked = ex.join(dfreq, blocks + ["_tok"])
    per_doc = ranked.groupBy(id_col, *blocks).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_df"), F.col("_tok")))
        ).alias("_ordered")
    )
    size = F.size("_ordered")
    plen = (size - F.ceil(F.lit(float(threshold)) * size) + F.lit(1)).cast("int")
    toks = per_doc.select(
        F.col(id_col), *[F.col(c) for c in blocks],
        size.alias("_sz"),
        F.explode(
            F.transform(
                F.slice(F.col("_ordered"), F.lit(1), plen), lambda x: x["_tok"]
            )
        ).alias("_tok"),
    )
    a = toks.select(
        F.col(id_col).alias("_id_a"),
        F.col("_sz").alias("_sz_a"),
        *[F.col(c) for c in blocks],
        "_tok",
    )
    b = toks.select(
        F.col(id_col).alias("_id_b"),
        F.col("_sz").alias("_sz_b"),
        *[F.col(c).alias(f"_b_{c}") for c in blocks],
        F.col("_tok").alias("_b_tok"),
    )
    t = float(threshold)
    cond = (
        (a["_tok"] == b["_b_tok"])
        & (a["_id_a"] < b["_id_b"])
        & (b["_sz_b"] * t <= a["_sz_a"])
        & (a["_sz_a"] * t <= b["_sz_b"])
    )
    for c in blocks:
        cond = cond & (a[c] == b[f"_b_{c}"])
    cand = a.join(b, cond).select("_id_a", "_id_b").distinct()
    sets = docs.select(F.col(id_col), F.col(set_col))
    sa = sets.select(
        F.col(id_col).alias("_id_a"), F.col(set_col).alias("_sh_a")
    )
    sb = sets.select(
        F.col(id_col).alias("_id_b"), F.col(set_col).alias("_sh_b")
    )
    # |a∪b| = |a| + |b| - |a∩b| (sets are distinct): one array traversal
    # per candidate instead of intersect + union materialization
    inter = F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
    jac = inter / (
        F.size("_sh_a").cast("double") + F.size("_sh_b").cast("double") - inter
    )
    return (
        cand.join(sa, "_id_a")
        .join(sb, "_id_b")
        .withColumn("jac", jac)
        .filter(F.col("jac") >= threshold)
        .select(
            F.col("_id_a").alias(f"{id_col}_a"),
            F.col("_id_b").alias(f"{id_col}_b"),
            "jac",
        )
    )


def srp_candidate_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    bits: int = ANN_BITS,
    tables: int = ANN_TABLES,
    dim: int = ANN_DIM,
) -> DataFrame:
    """Embedding pairs (a < b) with cosine >= threshold, candidates via
    SRP-LSH bucket equi-join (ann.py machinery), exact cosine verify.

    Recall < 1 (LSH); the oracle mirrors the identical buckets.
    """
    e = with_bucket_keys(
        df.select(id_col, vec_col), vec_col, bits=bits, tables=tables, dim=dim
    )
    a = e.select(
        F.col(id_col).alias("_id_a"), F.col(vec_col).alias("_v_a"), "_tbl", "_bk"
    )
    b = e.select(
        F.col(id_col).alias("_id_b"), F.col(vec_col).alias("_v_b"), "_tbl", "_bk"
    )
    cand = (
        a.join(b, ["_tbl", "_bk"])
        .filter(F.col("_id_a") < F.col("_id_b"))
        .dropDuplicates(["_id_a", "_id_b"])
    )

    def _d(c):
        return F.transform(c, lambda x: x.cast("double"))

    dot = F.aggregate(
        F.zip_with(_d(F.col("_v_a")), _d(F.col("_v_b")), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def _norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    return (
        cand.withColumn(
            "cos", dot / (_norm(F.col("_v_a")) * _norm(F.col("_v_b")))
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("_id_a").alias(f"{id_col}_a"),
            F.col("_id_b").alias(f"{id_col}_b"),
            "cos",
        )
    )
