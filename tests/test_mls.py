"""operators/mls.py — generated Cramer solve vs numpy linear algebra."""

from __future__ import annotations

import numpy as np
import pytest

from query_cost_feature_engineering_spark.operators.mls import (
    _gram_symbol,
    det_py,
    det_terms,
    solve_py,
    solve_sub_py,
)


def _gram_dict(x: np.ndarray, y: np.ndarray) -> dict[str, float]:
    n = x.shape[1]
    vals = {}
    for i in range(n):
        for j in range(i, n):
            vals[_gram_symbol(i, j)] = float((x[:, i] * x[:, j]).sum())
        vals[f"b_{i}"] = float((x[:, i] * y).sum())
    return vals


@pytest.mark.parametrize("n", [2, 3, 4])
def test_det_py_matches_numpy(n):
    rng = np.random.default_rng(3)
    m = rng.integers(1, 20, size=(n, n)).astype(float)
    vals = {
        _gram_symbol(i, j): float(m[min(i, j), max(i, j)])
        for i in range(n)
        for j in range(n)
    }
    sym_m = np.array(
        [[vals[_gram_symbol(i, j)] for j in range(n)] for i in range(n)]
    )
    assert det_py(n, None, vals) == pytest.approx(np.linalg.det(sym_m), rel=1e-9)


def test_det_terms_count_and_signs():
    terms = det_terms(4)
    assert len(terms) == 24
    assert sum(s for s, _ in terms) == 0  # 12 even + 12 odd permutations


@pytest.mark.parametrize("n", [2, 3, 4])
def test_solve_py_matches_lstsq(n):
    rng = np.random.default_rng(7)
    x = rng.integers(1, 50, size=(200, n)).astype(float)
    x[:, -1] = 1.0  # intercept column
    beta_true = rng.integers(-5, 6, size=n).astype(float)
    y = x @ beta_true  # exact linear => unique solution
    got = solve_py(n, _gram_dict(x, y))
    np.testing.assert_allclose(got, beta_true, rtol=1e-8)


def test_solve_sub_py_equals_direct_subfit():
    rng = np.random.default_rng(11)
    x = rng.integers(1, 50, size=(300, 4)).astype(float)
    x[:, -1] = 1.0
    y = rng.integers(1, 1000, size=300).astype(float)
    full = _gram_dict(x, y)
    for active in ([0, 1, 3], [1, 2, 3], [0, 3], [0, 1, 2, 3]):
        got = solve_sub_py(list(active), full)
        direct = solve_py(len(active), _gram_dict(x[:, active], y))
        # same float op order on identical integer sums => bit-identical
        assert got == direct
