"""Int8 embedding quantization: codes in range, ranking recall vs the
float brute force measured (not assumed), determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from query_cost_feature_engineering_spark.operators.quant import (
    with_quantized,
)
from query_cost_feature_engineering_spark.queries import (
    embedding_cosine_topk,
    quantized_cosine_topk,
)

SF = "/root/testdata/sf0.001"


def test_codes_in_int8_range_and_max_hits_127(spark):
    em = with_quantized(spark.read.parquet(f"{SF}/embeddings.parquet"))
    row = (
        em.select(
            F.array_max("q").alias("hi"), F.array_min("q").alias("lo")
        )
        .agg(F.max("hi").alias("hi"), F.min("lo").alias("lo"))
        .first()
    )
    assert -127 <= row.lo and row.hi <= 127
    # symmetric scheme maps each vector's max-|x| element to ±127
    at_limit = em.filter(
        (F.array_max("q") == 127) | (F.array_min("q") == -127)
    ).count()
    assert at_limit == em.count()


def test_quantized_topk_recall_vs_float(spark):
    f = embedding_cosine_topk(spark, SF).toPandas()
    q = quantized_cosine_topk(spark, SF).toPandas()
    fl = f.groupby("target_id")["neighbor_id"].apply(set)
    qu = q.groupby("target_id")["neighbor_id"].apply(set)
    assert set(fl.index) == set(qu.index)
    recalls = [len(fl[t] & qu[t]) / 3 for t in fl.index]
    # int8 on 64-dim vectors: mean recall@3 stays high (0.97 measured at
    # sf0.01); assert a margin below the measured floor
    assert sum(recalls) / len(recalls) >= 0.85, recalls


def test_quantized_topk_deterministic(spark):
    a = quantized_cosine_topk(spark, SF).orderBy("target_id", "rnk").collect()
    b = quantized_cosine_topk(spark, SF).orderBy("target_id", "rnk").collect()
    assert a == b
