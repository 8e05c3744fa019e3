"""Column-function helpers (vector math, text metrics, cross-engine hashing)."""

from spark_sql_on_hbase_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
)
from spark_sql_on_hbase_spark.functions.text import (
    hash60,
    whitespace_tokens,
    word_ngrams,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "hash60",
    "whitespace_tokens",
    "word_ngrams",
]
