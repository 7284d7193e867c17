from mapreduce_distributed_systems_spark.functions.text import (  # noqa: F401
    WORD_SPLIT_RE,
    words,
)
