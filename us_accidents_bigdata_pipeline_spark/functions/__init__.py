from .columns import (
    temporal_features,
    impute_value,
    normalize_empty_string,
    bool_to_int,
    nonempty_token_count,
    token_count,
    word_tokens,
    dot_product,
    l2_norm,
    sq_dist,
    cosine_similarity,
    haversine_km,
)

__all__ = [
    "temporal_features",
    "impute_value",
    "normalize_empty_string",
    "bool_to_int",
    "nonempty_token_count",
    "token_count",
    "word_tokens",
    "dot_product",
    "l2_norm",
    "sq_dist",
    "cosine_similarity",
    "haversine_km",
]
