"""Feature reduction: greedy leave-one-out ablation, Spark-first.

Graft of the reference's feature-reduction pair (SURVEY.md §2.A A19/A20):
SHAP filtering (models/QPPNet.py:433-533) and the greedy ablation loop
(greedy/deepNN.py:92-136) both answer "which feature columns can be
dropped without hurting the fit?". The reference retrains a 400-epoch
probe NN per candidate drop, sequentially.

Spark-first reformulation: ONE distributed pass computes the Gram
sufficient statistics (XᵀX, Xᵀy, yᵀy, n) of a linear probe model on the
train and holdout splits; every candidate subset's closed-form OLS fit
and holdout error is then pure driver-side linear algebra on those tiny
matrices (numpy, microseconds per candidate). The greedy loop that took
the reference hours of GPU retraining costs one Spark aggregation total —
and the holdout split is the same leakage-free hash split the engine uses
everywhere (operators/split.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_stats(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> dict[str, np.ndarray | float]:
    """XᵀX (with intercept column), Xᵀy, yᵀy, n — one aggregation pass."""
    cols = ["__one"] + feature_cols
    df = df.withColumn("__one", F.lit(1.0))
    aggs = []
    d = len(cols)
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"xx_{i}_{j}")
            )
        aggs.append(F.sum(F.col(cols[i]) * F.col(label_col)).alias(f"xy_{i}"))
    aggs += [
        F.sum(F.col(label_col) * F.col(label_col)).alias("yy"),
        F.count(F.lit(1)).alias("n"),
    ]
    row = df.agg(*aggs).collect()[0]
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            xtx[i, j] = xtx[j, i] = row[f"xx_{i}_{j}"] or 0.0
        xty[i] = row[f"xy_{i}"] or 0.0
    return {"xtx": xtx, "xty": xty, "yy": float(row["yy"] or 0.0), "n": int(row["n"])}


def _holdout_mse(train: dict, test: dict, idx: list[int]) -> float:
    """Closed-form holdout MSE of the OLS fit restricted to columns idx."""
    sub = np.ix_(idx, idx)
    beta, *_ = np.linalg.lstsq(train["xtx"][sub], train["xty"][idx], rcond=None)
    # ||y - Xb||² = yᵀy - 2 bᵀXᵀy + bᵀXᵀXb, all from the test split's stats
    sse = (
        test["yy"]
        - 2.0 * beta @ test["xty"][idx]
        + beta @ test["xtx"][sub] @ beta
    )
    return max(float(sse), 0.0) / max(test["n"], 1)


def greedy_ablation(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    split_col: str = "split",
    tol: float = 1.001,
) -> dict:
    """Drop features greedily while holdout MSE stays within ``tol``× the
    incumbent. ``df`` must carry a 'train'/'test' ``split_col`` (from
    operators/split.hash_split). Returns kept/dropped lists + history.

    One Spark pass per split; the whole greedy search is driver-side.
    """
    train = gram_stats(df.filter(F.col(split_col) == "train"), feature_cols, label_col)
    test = gram_stats(df.filter(F.col(split_col) == "test"), feature_cols, label_col)

    active = list(range(1, len(feature_cols) + 1))  # 0 = intercept, always kept
    best = _holdout_mse(train, test, [0] + active)
    history = [{"dropped": None, "mse": best}]
    improved = True
    while improved and len(active) > 1:
        improved = False
        for cand in sorted(active):
            trial = [0] + [i for i in active if i != cand]
            mse = _holdout_mse(train, test, trial)
            if mse <= best * tol:
                active = [i for i in active if i != cand]
                best = min(best, mse)
                history.append(
                    {"dropped": feature_cols[cand - 1], "mse": mse}
                )
                improved = True
                break
    kept = [feature_cols[i - 1] for i in active]
    dropped = [c for c in feature_cols if c not in kept]
    return {"kept": kept, "dropped": dropped, "mse": best, "history": history}
