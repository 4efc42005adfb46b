from beyond_vector_search_spark.functions.text import (
    char_ngrams,
    has_digits,
    join_top_sentences,
    norm_answer,
    tokenize,
)
from beyond_vector_search_spark.functions.hashing import hash64, md5_hex, minhash_signature
from beyond_vector_search_spark.functions.vectors import cosine_sim, dot_product, l2_norm

__all__ = [
    "tokenize",
    "char_ngrams",
    "has_digits",
    "join_top_sentences",
    "norm_answer",
    "md5_hex",
    "hash64",
    "minhash_signature",
    "dot_product",
    "cosine_sim",
    "l2_norm",
]
