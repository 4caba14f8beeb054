from query_cost_feature_engineering_spark.functions.image_features import (  # noqa: F401
    decode_stats_pandas,
    with_basics,
    with_image_features,
    with_phash_bits,
)
from query_cost_feature_engineering_spark.functions.text import (  # noqa: F401
    with_caption_features,
    with_text_analysis,
)
