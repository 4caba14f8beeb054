from query_cost_feature_engineering_spark.plans.pipeline import (  # noqa: F401
    FEATURE_ORDER,
    assemble_vector,
    compute_features,
)
