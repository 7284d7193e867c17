"""Inverted index (mrapps/indexer.go:20-39).

Reference semantics: per document, the *distinct* word set
(mrapps/indexer.go:21-25) → `(word, docname)` pairs; reduce sorts the
document list and emits `"<ndocs> <doc1,doc2,...>"`
(mrapps/indexer.go:36-38). Per SURVEY.md §7 risk 3 we keep typed
columns (`n_docs` bigint, `docs` csv string) so the oracle compares
values, formatting only at the sink.

Scale note: the distinct (word, doc) dedup is a map-side-combinable
hash aggregate; collect_set is bounded by #docs containing the word —
for a 100 TB corpus a postings list per hot word can exceed executor
memory, so the scale path would bucket postings (word, doc_bucket).
At the driver's SFs the direct form is optimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

INDEX_ORACLE = """
SELECT word,
       count(*) AS n_docs,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS docs
FROM (
  SELECT DISTINCT doc_id, word
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
    FROM documents
  )
  WHERE word <> ''
)
GROUP BY word
"""


def inverted_index(docs: DataFrame) -> DataFrame:
    pairs = (
        docs.select("doc_id", F.explode(words("text")).alias("word"))
        .dropDuplicates(["doc_id", "word"])
    )
    return pairs.groupBy("word").agg(
        F.count("*").alias("n_docs"),
        F.concat_ws(",", F.sort_array(F.collect_set("doc_id"))).alias("docs"),
    )


@register(
    "inverted_index",
    oracle=INDEX_ORACLE,
    tags=("mr-app", "aggregate", "distinct"),
    bench=True,
    doc="Inverted index: word -> (n_docs, sorted doc csv); mrapps/indexer.go:20-39.",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inverted_index(load_table(spark, sf_dir, "documents"))


@register(
    "inverted_index_bucketed",
    oracle=INDEX_ORACLE,  # must agree exactly with the direct form
    tags=("mr-app", "aggregate", "distinct", "scale-path"),
    doc="Scale-path inverted index: postings built per (word, doc bucket) "
    "then merged — a hot word's postings list is assembled from B "
    "pre-deduped, pre-sorted bucket lists instead of one giant "
    "collect_set, bounding any single aggregation row (SCALE.md).",
)
def q_inverted_index_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_buckets = 4
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        docs.select("doc_id", F.explode(words("text")).alias("word"))
        .dropDuplicates(["doc_id", "word"])
        .withColumn("b", F.col("doc_id") % n_buckets)
    )
    per_bucket = pairs.groupBy("word", "b").agg(
        F.count("*").alias("n_b"),
        F.sort_array(F.collect_set("doc_id")).alias("docs_b"),
    )
    return per_bucket.groupBy("word").agg(
        F.sum("n_b").alias("n_docs"),
        F.concat_ws(
            ",", F.array_sort(F.flatten(F.collect_list("docs_b")))
        ).alias("docs"),
    )
