"""Closed-form multi-regressor OLS via generated Cramer expressions.

The reference fits per-operator cost curves with scipy ``curve_fit``
(snapshot/snapshot_linear.py): a 2-parameter linear model for most ops
(func2, :16-23), and a 4-parameter bilinear model for NestedLoop
(func4 ``y = c0·n1·n2 + c1·n1 + c2·n2 + c3``, :21-23,61-82,144-156).
Spark-first, both are ONE ``groupBy().agg()`` computing the Gram sufficient
statistics (Σ rᵢ·rⱼ, Σ rᵢ·y) followed by a closed-form solve — no UDF, no
driver loop, no iterative optimizer.

The 4×4 solve is Cramer's rule, EXPANDED SYMBOLICALLY once (24 Leibniz
terms per determinant) and rendered twice from the same term lists: as a
Spark Column tree and as DuckDB SQL. Paired with integer-valued
regressors (fixed-point scaling), the Gram sums are exact BIGINTs on both
engines and the identical expression tree then produces identical
doubles — engine-independent coefficients without any tolerance games.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _perm_sign(p: tuple[int, ...]) -> int:
    inv = sum(
        1
        for i in range(len(p))
        for j in range(i + 1, len(p))
        if p[i] > p[j]
    )
    return -1 if inv % 2 else 1


def det_terms(n: int) -> list[tuple[int, list[int]]]:
    """Leibniz expansion of an n×n determinant: (sign, [col index per row])."""
    return [( _perm_sign(p), list(p)) for p in permutations(range(n))]


def _gram_symbol(i: int, j: int) -> str:
    i, j = min(i, j), max(i, j)
    return f"g_{i}_{j}"


def _matrix_symbols(n: int, rhs_col: int | None) -> list[list[str]]:
    """Symbol matrix for Cramer: the Gram matrix with column ``rhs_col``
    (if given) replaced by the RHS vector symbols b_i."""
    return [
        [
            f"b_{i}" if j == rhs_col else _gram_symbol(i, j)
            for j in range(n)
        ]
        for i in range(n)
    ]


def det_spark(n: int, rhs_col: int | None, sym) -> Column:
    """Determinant as a Spark Column; ``sym(name) -> Column``."""
    m = _matrix_symbols(n, rhs_col)
    total = None
    for sign, cols in det_terms(n):
        prod = F.lit(float(sign))
        for i, j in enumerate(cols):
            prod = prod * sym(m[i][j])
        total = prod if total is None else total + prod
    return total


def det_sql(n: int, rhs_col: int | None, sym) -> str:
    """Determinant as SQL; ``sym(name) -> str``. Same term/op order as
    ``det_spark`` so both engines evaluate the identical float tree."""
    m = _matrix_symbols(n, rhs_col)
    parts = []
    for sign, cols in det_terms(n):
        factors = " * ".join(sym(m[i][j]) for i, j in enumerate(cols))
        parts.append(f"({float(sign)} * {factors})")
    return "(" + " + ".join(parts) + ")"


def gram_agg_exprs(regs: list[Column], y: Column) -> list[Column]:
    """Exact integer Gram sums for integer-valued regressors/label —
    order-independent, so Spark's partial aggregation and DuckDB's serial
    scan produce bit-identical inputs to the solve. Per-row products fit
    a BIGINT; the running sums use DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB) so they stay exact at 10^12-row scale."""
    aggs = []
    n = len(regs)
    for i in range(n):
        for j in range(i, n):
            aggs.append(
                F.sum((regs[i] * regs[j]).cast("long").cast("decimal(38,0)"))
                .alias(_gram_symbol(i, j))
            )
        aggs.append(
            F.sum((regs[i] * y).cast("long").cast("decimal(38,0)")).alias(f"b_{i}")
        )
    return aggs


def gram_aggregate(
    df, group_col: str, regs: list[Column], y: Column, chunk_bits: int = 20
):
    """Two-level exact Gram aggregation: per-row BIGINT products are first
    summed AS LONGS within bounded chunks (≤ 2^chunk_bits rows each —
    ``monotonically_increasing_id() >> chunk_bits`` never crosses a
    partition because the id's high 31 bits are the partition id), then
    the tiny chunk partials are summed as DECIMAL(38,0). Identical exact
    integers to the single-level decimal sum (integer addition is
    order-free), but the hot per-row path is codegen'd long arithmetic
    instead of 128-bit decimal updates (measured ~2.5× less per-row agg
    cost at sf0.1), and the decimal slow path touches only
    rows/2^chunk_bits values (at 10^12 rows and the default 2^20 chunk:
    under a million).

    Overflow contract: |per-row product| · 2^chunk_bits must stay below
    2^63 ≈ 9.2e18. The fixed-point features here are bounded by ~5e11
    per product, so the default chunk of 2^20 rows leaves 4 orders of
    margin. Returns df.groupBy(group_col) with the same column names and
    decimal types as ``gram_agg_exprs`` plus ``n_samples``."""
    n = len(regs)
    prods, names = [], []
    for i in range(n):
        for j in range(i, n):
            s = _gram_symbol(i, j)
            prods.append((regs[i] * regs[j]).cast("long").alias(s))
            names.append(s)
        prods.append((regs[i] * y).cast("long").alias(f"b_{i}"))
        names.append(f"b_{i}")
    chunked = df.select(
        F.col(group_col),
        F.shiftrightunsigned(
            F.monotonically_increasing_id(), chunk_bits
        ).alias("_chunk"),
        *prods,
    ).groupBy(group_col, "_chunk").agg(
        *[F.sum(s).alias(s) for s in names],
        F.count(F.lit(1)).alias("n_samples"),
    )
    return chunked.groupBy(group_col).agg(
        *[
            F.sum(F.col(s).cast("decimal(38,0)")).alias(s)
            for s in names
        ],
        F.sum("n_samples").alias("n_samples"),
    )


def gram_sql_exprs(regs: list[str], y: str) -> list[str]:
    out = []
    n = len(regs)
    for i in range(n):
        for j in range(i, n):
            out.append(
                f"sum(CAST(CAST(({regs[i]}) * ({regs[j]}) AS BIGINT) AS HUGEINT))"
                f" AS {_gram_symbol(i, j)}"
            )
        out.append(
            f"sum(CAST(CAST(({regs[i]}) * ({y}) AS BIGINT) AS HUGEINT)) AS b_{i}"
        )
    return out


def solve_spark(n: int) -> list[Column]:
    """Coefficients c_0..c_{n-1} from the Gram-sum columns (g_i_j, b_i)."""
    sym = lambda name: F.col(name).cast("double")  # noqa: E731
    d = det_spark(n, None, sym)
    return [det_spark(n, k, sym) / d for k in range(n)]


def solve_sql(n: int) -> list[str]:
    sym = lambda name: f"CAST({name} AS DOUBLE)"  # noqa: E731
    d = det_sql(n, None, sym)
    return [f"({det_sql(n, k, sym)} / {d})" for k in range(n)]


def det_py(n: int, rhs_col: int | None, vals: dict[str, float]) -> float:
    """Determinant in driver-side Python — the SAME term and operation
    order as ``det_spark``/``det_sql`` (all IEEE doubles), so the three
    renderers produce bit-identical results from identical inputs."""
    m = _matrix_symbols(n, rhs_col)
    total = None
    for sign, cols in det_terms(n):
        prod = float(sign)
        for i, j in enumerate(cols):
            prod = prod * vals[m[i][j]]
        total = prod if total is None else total + prod
    return total


def solve_py(n: int, vals: dict[str, float]) -> list[float]:
    """Coefficients from a collected Gram row. For FEW groups (the normal
    snapshot case: one row per operator type), collecting the tiny Gram
    aggregate and solving on the driver beats embedding the 24-term
    Cramer expansion in codegen — the distributed work (the Gram
    aggregation) is unchanged, and the generated-code size stops scaling
    with the expansion. ``solve_spark`` remains for high-cardinality
    groups where a collect would not be tiny."""
    d = det_py(n, None, vals)
    return [det_py(n, k, vals) / d for k in range(n)]


def solve_sub_py(
    active: list[int], vals: dict[str, float]
) -> list[float]:
    """Solve the OLS restricted to the regressor subset ``active`` using
    the FULL Gram's entries (every sub-Gram is a submatrix): one
    distributed aggregation serves all candidate subsets — the engine's
    leave-one-out ablation needs no extra passes."""
    sub = {}
    for a, i in enumerate(active):
        for b, j in enumerate(active):
            sub[_gram_symbol(a, b)] = vals[_gram_symbol(i, j)]
        sub[f"b_{a}"] = vals[f"b_{i}"]
    return solve_py(len(active), sub)
