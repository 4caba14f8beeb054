"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the centerpiece backward as-of join over the
sf0.001 parquet tables; ``queries()`` exposes every implemented operator
(SURVEY.md §2 + training-data ops); ``oracle_sql()`` gives the DuckDB
mirror for each SQL-expressible one. Image-pipeline queries
(image_features / image_asof_features / phash_neardup_images) synthesize
their own deterministic input-table (the BASELINE.json input_hint shape)
and are covered by the pandas golden oracle in pytest instead.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: gap-sessionized events + backward as-of join of the latest
    purchase onto a probe spine, at sf0.001."""
    from query_cost_feature_engineering_spark.queries import (
        asof_purchases_window,
    )

    return asof_purchases_window(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from query_cost_feature_engineering_spark.queries import REGISTRY

    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    from query_cost_feature_engineering_spark.oracles import ORACLES

    return dict(ORACLES)
