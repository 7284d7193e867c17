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
