"""Int8 embedding quantization for the similarity stack.

At 10^12 vectors the embedding column dominates storage and shuffle
volume; symmetric per-vector int8 quantization cuts both 4× (float32 →
int8) while keeping cosine ranking nearly intact (recall measured in
``tests/test_quant.py``, not assumed). The scheme is the standard
symmetric one: ``scale = 127 / max|x|``, ``q_i = floor(x_i·scale + .5)``.

Everything stays JVM-side (``transform``/``zip_with``/``aggregate`` —
no Python in the hot path), and scoring is engine-exact by
construction: quantized dot products and norms are INTEGER-valued, and
integers below 2^53 are exactly representable in float64 regardless of
summation order, so Spark's aggregate fold and any other engine's dot
product agree bitwise — the one cross-engine float expression is the
final ``dot / sqrt(n_a·n_b)``, written in the same op order in the
DuckDB oracle.

Role mirror: the reference compresses features by dropping columns
(SHAP/greedy reduction, `models/QPPNet.py:433-533`); quantization is
the orthogonal compression axis for dense vector columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_expr(vec: Column) -> Column:
    """array<numeric> → array<long> int8 codes (symmetric, per-vector).

    ``floor(x·s + 0.5)`` is round-half-up for negatives too — chosen
    over banker's rounding because every engine's ``floor`` agrees.

    All-zero vectors quantize to NULL (CASE WHEN is lazy, so the
    127/max division never evaluates when max == 0 — under ANSI mode a
    plain division would throw DIVIDE_BY_ZERO on the degenerate row and
    kill the whole 10^12-row job)."""
    m = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    s = F.lit(127.0) / m
    return F.when(
        m > 0,
        F.transform(vec, lambda x: F.floor(x * s + F.lit(0.5)).cast("long")),
    )


def with_quantized(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q"
) -> DataFrame:
    """Add int8 codes for ``vec_col`` (cast through double first so both
    engines quantize identical float64 inputs)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(out_col, quantize_expr(v))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two code arrays (long)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine in the int8 domain: integer dot / sqrt(int norms product).
    NULL when either code vector is all-zero."""
    num = int_dot(qa, qb).cast("double")
    den = F.sqrt((int_dot(qa, qa) * int_dot(qb, qb)).cast("double"))
    return F.when(den > 0, num / den)
