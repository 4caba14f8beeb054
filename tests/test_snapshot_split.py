import numpy as np
import pandas as pd

from query_cost_feature_engineering_spark.operators.snapshot import (
    annotate_group_fit,
    fit_linear_by_group,
    normalize_by_group,
)
from query_cost_feature_engineering_spark.operators.split import (
    hash_split,
    time_cutoff_split,
)


def _toy(spark, seed=3):
    rng = np.random.default_rng(seed)
    n = 300
    pdf = pd.DataFrame(
        {
            "grp": rng.choice(["scan", "join", "sort"], n),
            "x": rng.uniform(1, 100, n),
        }
    )
    slope = pdf["grp"].map({"scan": 2.0, "join": 0.5, "sort": 5.0})
    icpt = pdf["grp"].map({"scan": 10.0, "join": 1.0, "sort": -3.0})
    pdf["y"] = slope * pdf["x"] + icpt + rng.normal(0, 0.01, n)
    return spark.createDataFrame(pdf), pdf


def test_fit_linear_matches_numpy_lstsq(spark):
    sdf, pdf = _toy(spark)
    got = fit_linear_by_group(sdf, "grp", "x", "y").toPandas().set_index("grp")
    for g, sub in pdf.groupby("grp"):
        coef = np.polyfit(sub["x"], sub["y"], 1)
        assert np.isclose(got.loc[g, "slope"], coef[0], rtol=1e-6)
        assert np.isclose(got.loc[g, "intercept"], coef[1], rtol=1e-4, atol=1e-6)


def test_fit_fallback_small_group(spark):
    pdf = pd.DataFrame({"grp": ["a", "a", "b"], "x": [1.0, 2.0, 5.0], "y": [3.0, 4.0, 9.0]})
    got = (
        fit_linear_by_group(spark.createDataFrame(pdf), "grp", "x", "y", min_samples=3)
        .toPandas()
        .set_index("grp")
    )
    assert got.loc["b", "slope"] == 0.0 and got.loc["b", "intercept"] == 9.0
    assert got.loc["a", "slope"] == 0.0  # below min_samples


def test_annotate_broadcasts_factors(spark):
    sdf, _ = _toy(spark)
    out = annotate_group_fit(sdf, "grp", "x", "y")
    assert {"slope", "intercept"} <= set(out.columns)
    assert out.count() == sdf.count()
    pred_err = out.selectExpr("avg(abs(y - (slope*x + intercept)))").first()[0]
    assert pred_err < 0.05


def test_normalize_train_only_stats(spark):
    sdf, pdf = _toy(spark)
    train = sdf.filter("x < 50")
    out = normalize_by_group(sdf, "grp", ["y"], stats_on=train).toPandas()
    tr = pdf[pdf["x"] < 50]
    for g, sub in tr.groupby("grp"):
        mean, mx = sub["y"].mean(), sub["y"].abs().max()
        rows = out[out["grp"] == g]
        want = (rows["y"] - mean) / (mx + 1e-9)
        assert np.allclose(rows["y_norm"], want, rtol=1e-9)


def test_hash_split_deterministic_and_duckdb_identical(spark):
    import duckdb

    sdf, pdf = _toy(spark)
    sdf = sdf.withColumn("id", sdf.x.cast("string"))
    got = hash_split(sdf, "id").select("id", "split").toPandas()
    frac = (got["split"] == "train").mean()
    assert 0.7 < frac < 0.9
    con = duckdb.connect()
    con.register("t", got)
    thr = format(int(0.8 * 16**8), "08x")
    mismatch = con.execute(
        f"""SELECT count(*) FROM t
            WHERE (CASE WHEN substr(md5(id),1,8) < '{thr}'
                   THEN 'train' ELSE 'test' END) <> split"""
    ).fetchone()[0]
    assert mismatch == 0


def test_time_cutoff_split(spark, images_sdf):
    out = time_cutoff_split(images_sdf, "ts", quantile=0.8)
    agg = dict(out.groupBy("split").count().collect())
    assert agg["train"] > agg["test"] > 0
