from mapreduce_framework_spark.functions.hashing import (
    fnv1a32,
    fnv1a32_bucket,
    fnv1a32_py,
    key2shard,
)
from mapreduce_framework_spark.functions.text import (
    tokenize,
    tokenize_words,
    WORD_SPLIT_RE,
)

__all__ = [
    "fnv1a32",
    "fnv1a32_bucket",
    "fnv1a32_py",
    "key2shard",
    "tokenize",
    "tokenize_words",
    "WORD_SPLIT_RE",
]
