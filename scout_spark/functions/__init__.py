from scout_spark.functions.normalize import canon, canon_ascii, tokens, dedup_tokens
from scout_spark.functions.geo import haversine_km, proximity_decay, bbox_predicate
from scout_spark.functions.scoring import (
    importance_expr,
    kind_expr,
    type_boost_expr,
    score_expr,
    DEFAULT_WEIGHTS,
    DEFAULT_TYPE_BOOST,
)
from scout_spark.functions.vectors import (
    dot_product,
    l2_norm,
    cosine_similarity,
)
from scout_spark.functions.text import (
    whitespace_tokens,
    token_count,
    char_ngrams,
    word_shingles,
    quality_features,
    langid_expr,
    fingerprint_md5,
    rolling_hash,
)

__all__ = [
    "canon",
    "canon_ascii",
    "tokens",
    "dedup_tokens",
    "haversine_km",
    "proximity_decay",
    "bbox_predicate",
    "importance_expr",
    "kind_expr",
    "type_boost_expr",
    "score_expr",
    "DEFAULT_WEIGHTS",
    "DEFAULT_TYPE_BOOST",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "whitespace_tokens",
    "token_count",
    "char_ngrams",
    "word_shingles",
    "quality_features",
    "langid_expr",
    "fingerprint_md5",
    "rolling_hash",
]
