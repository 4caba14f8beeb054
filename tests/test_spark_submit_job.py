"""Deployment-path smoke test: the pipeline job must run under real
``spark-submit --py-files <pkg.zip>`` with NO repo checkout on any
import path — the shipped zip alone must satisfy every import (driver
AND python workers, which unpickle the decode UDF)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


def test_spark_submit_with_pyfiles_zip_only(spark, tmp_path):
    from query_cost_feature_engineering_spark.session import package_zip
    from query_cost_feature_engineering_spark.sources.images import (
        generate_images_pandas,
    )

    src = str(tmp_path / "images")
    out = str(tmp_path / "features")
    spark.createDataFrame(generate_images_pandas(80, 10, 21)).write.parquet(
        src
    )

    zip_path = package_zip(str(tmp_path / "pkg.zip"))
    # copy the entrypoint AWAY from the repo so its parents[2] sys.path
    # fallback points at an empty directory — imports must come from the zip
    script = tmp_path / "run_pipeline.py"
    shutil.copy(
        Path("query_cost_feature_engineering_spark/jobs/run_pipeline.py"),
        script,
    )
    env = {
        k: v for k, v in os.environ.items() if k != "PYTHONPATH"
    }
    env["SPARK_GRAFT_CPUS"] = "2"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--py-files", zip_path,
            str(script),
            "--input", src,
            "--output", out,
            "--buckets", "4",
            "--master", "local[2]",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # output exists with all rows, and the resumable manifests are there
    import pyarrow.dataset as ds

    table = ds.dataset(out, format="parquet", partitioning="hive").to_table()
    assert table.num_rows == 80
    manifests = list((Path(out) / "_manifest").glob("part=*.json"))
    assert manifests, "per-partition manifests missing"
