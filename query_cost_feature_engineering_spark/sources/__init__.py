from query_cost_feature_engineering_spark.sources.images import (  # noqa: F401
    VOCAB,
    generate_images_pandas,
    generate_spine_pandas,
    write_images_table,
)
