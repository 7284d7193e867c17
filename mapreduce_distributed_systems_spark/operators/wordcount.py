"""Word count — the reference's flagship query (mrapps/wc.go:22-43).

Reference semantics: tokenize each document on runs of non-letters
(`strings.FieldsFunc` with `!unicode.IsLetter`, mrapps/wc.go:24-27),
emit `(word, "1")` per occurrence, reduce = count. Case-sensitive, no
lowercasing, empty tokens impossible by construction.

Spark-first formulation: scan → split/explode (narrow) → hash
aggregate. Catalyst inserts a partial (map-side) aggregate before the
exchange — the combiner the reference lacks (SURVEY.md §2.A note) —
so at 100 TB the shuffle carries one row per distinct word per
partition, not one per occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

WC_ORACLE = """
SELECT word, count(*) AS cnt
FROM (
  SELECT unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
"""


def word_count(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "wc",
    oracle=WC_ORACLE,
    tags=("mr-app", "aggregate"),
    bench=True,
    doc="Word count over documents.text (mrapps/wc.go:22-43 semantics).",
)
def q_wc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_count(load_table(spark, sf_dir, "documents"))
