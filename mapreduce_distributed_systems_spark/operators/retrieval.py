"""Lexical and hybrid retrieval over the `documents` table: BM25
top-k (the inverted-index scoring the reference's indexer app
(mrapps/indexer.go:20-39) is one posting-list aggregation away from),
and reciprocal-rank fusion of the lexical and dense (cosine) rankers —
the standard hybrid-retrieval shape production search stacks serve.

Scale design (100 TB):
- the index is three map-side-combined aggregates over the token
  stream (tf, df, doclen) — the wc/indexer shuffle shape, never
  all-pairs;
- posting lists are IMPACT-PRUNED to a fixed cap per term
  (tf-descending, the static index-pruning of Anh & Moffat): scoring
  work per query is <= QUERY_TERMS x POSTING_CAP candidate rows,
  corpus-independent. The prune itself is two bounded windows (a
  per-input-partition top-cap, then a top-cap over the <= cap x
  n_partitions survivors — the r8 ANN-prune shape), so no single task
  ever sorts a full hot-term posting list;
- query terms are the QUERY_TERMS most selective (lowest document
  frequency) terms of each query document, so the posting lists
  visited are the SHORT ones and high-df terms (which carry near-zero
  IDF anyway) never fan out;
- fusion joins two ALREADY top-k ranked lists (<= 2k rows per query),
  so the fused window's input is bounded by construction.

Determinism: BM25 weights are IEEE expressions written with identical
association in both engines over integer (tf, df, dl) inputs and one
scalar double (avgdl); only the final per-(query, doc) sum crosses
engines, rounded to 6 decimals (the repo-wide float discipline). RRF
is integer-exact: each rank contributes round(1e9 / (60 + rank)) as a
BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.operators.similarity import (
    BRUTE_ORACLE,
    ann_cosine_topk,
)
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10
# deterministic query subset + hard cap: the ANN brute-baseline shape
# (similarity.py) — the stride keeps a fraction, the ORDER BY + LIMIT
# keeps the query block O(cap) at any corpus size.
BM25_QUERY_FILTER = "doc_id % 100 = 0"
BM25_QUERY_CAP = 256
# the QUERY_TERMS most selective (lowest-df) terms represent a query
QUERY_TERMS = 8
# static impact pruning: keep per term only the POSTING_CAP docs with
# the highest tf (doc_id tiebreak). Fixed, not corpus-scaled — that is
# the point: per-query candidate volume stays QUERY_TERMS x
# POSTING_CAP forever. The recall trade-off lands on high-df terms,
# whose IDF is near zero; at the fixture SFs the cap binds from
# sf0.1 up (df ~ 4k > 2048), exercising the prune under oracle parity.
POSTING_CAP = 2048

_TOKS_DUCK = (
    "list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '')"
)

# BM25 oracle body (no trailing SELECT) so the fusion oracle can embed
# it as a CTE chain. Every arithmetic expression is associated exactly
# as the Spark side writes it.
_BM25_CTES = f"""
tok AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2
),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1
),
scal AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
post AS (
  SELECT term, doc_id, tf FROM (
    SELECT term, doc_id, tf,
           row_number() OVER (PARTITION BY term
                              ORDER BY tf DESC, doc_id) AS prn
    FROM tf
  ) WHERE prn <= {POSTING_CAP}
),
q AS (
  SELECT doc_id AS query_id FROM documents
  WHERE {BM25_QUERY_FILTER} ORDER BY doc_id LIMIT {BM25_QUERY_CAP}
),
qt AS (
  SELECT query_id, term FROM (
    SELECT q.query_id, tf.term,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY df.df ASC, tf.term ASC) AS trn
    FROM q JOIN tf ON tf.doc_id = q.query_id
    JOIN df ON df.term = tf.term
  ) WHERE trn <= {QUERY_TERMS}
),
cand AS (
  SELECT qt.query_id, p.doc_id,
         ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (p.tf * ({BM25_K1} + 1.0))
           / (p.tf + {BM25_K1}
              * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl)) AS w
  FROM qt
  JOIN post p USING (term)
  JOIN df USING (term)
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN scal s
  WHERE p.doc_id <> qt.query_id
),
bm25_agg AS (
  SELECT query_id, doc_id, round(sum(w), 6) AS bm25
  FROM cand GROUP BY 1, 2
),
bm25_ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
  FROM bm25_agg
)"""

BM25_ORACLE = f"""
WITH {_BM25_CTES}
SELECT query_id, doc_id, bm25, rank
FROM bm25_ranked WHERE rank <= {BM25_TOP_K}
"""


def impact_prune(
    tf: DataFrame, cap: int, key: str = "term", value: str = "tf",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-`key` top-`cap` rows in (`value` DESC, `id_col` ASC) order
    via two bounded windows (the r8 ANN-prune shape): stage 1 takes
    the per-input-partition top-cap per key — a superset of the
    global top-cap, whatever the partitioning — so stage 2's per-key
    window reads <= cap x n_partitions rows, never a full hot-key
    posting list in one task. Results are exactly the naive
    `row_number() OVER (PARTITION BY key ORDER BY value DESC, id) <=
    cap` (differential-pinned in tests/test_retrieval.py)."""
    w1 = W.partitionBy(F.spark_partition_id(), key).orderBy(
        F.desc(value), F.asc(id_col)
    )
    local = tf.withColumn("_prn", F.row_number().over(w1)).where(
        F.col("_prn") <= cap
    ).drop("_prn")
    w2 = W.partitionBy(key).orderBy(F.desc(value), F.asc(id_col))
    return local.withColumn("_prn", F.row_number().over(w2)).where(
        F.col("_prn") <= cap
    ).drop("_prn")


@register(
    "doc_bm25_topk",
    oracle=BM25_ORACLE,
    tags=("retrieval", "text", "similarity", "index"),
    bench=True,
    doc="BM25 top-10 lexical retrieval for a deterministic query-doc "
    "subset: Okapi BM25 (k1=1.2, b=0.75) over an impact-pruned "
    "inverted index — per term only the POSTING_CAP highest-tf docs "
    "survive (static index pruning), and each query is its "
    "QUERY_TERMS lowest-df (most selective) terms, so per-query "
    "scoring work is QUERY_TERMS x POSTING_CAP candidates at ANY "
    "corpus size. The index build is the indexer/wc shuffle shape "
    "(three map-side-combined aggregates); the posting prune is two "
    "bounded windows (per-input-partition top-cap, then top-cap over "
    "the survivors), never a full hot-term sort.",
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index + impact prune + term-at-a-time scoring; see module
    docstring for the scale argument. Reference parity: the inverted
    index is mrapps/indexer.go:20-39's output with tf attached; BM25
    turns it into the ranked-retrieval query the reference's engine
    would serve with one more reduce."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(words("text")).alias("term"))
    # THE one corpus-sized pass: every downstream table (postings,
    # document frequencies, doc lengths, the scalar stats, the query
    # docs' term sets) derives from this (doc, term, tf) aggregate.
    # Cached + materialized NOW: without the cache each consumer
    # re-executes the tokenize scan (6 parquet scans of the corpus in
    # the executed plan, profiled round 9 -> 1 with it), and a lazily
    # populated cache would let AQE's concurrently-launched broadcast
    # subqueries race to recompute it (the curation lesson, round 7).
    # In production the pruned index is a persisted artifact (the
    # storage/vector_index.py manifest pattern); the cache is the
    # in-query stand-in.
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .cache()
    )
    tf.count()
    # doc length = sum of its term frequencies — a re-aggregation of
    # the cached tf table, not a second pass over the token stream
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    scal = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))

    # static impact pruning: only the POSTING_CAP highest-tf postings
    # per term can ever be scored (module docstring)
    post = impact_prune(tf, POSTING_CAP)

    # the query block scans ONLY the doc_id column (column-pruned,
    # TakeOrdered-bounded); query terms come from the cached tf
    q = (
        docs.where(F.expr(BM25_QUERY_FILTER))
        .orderBy("doc_id")
        .limit(BM25_QUERY_CAP)
        .select(F.col("doc_id").alias("query_id"))
    )
    # query representation: the QUERY_TERMS lowest-df terms of the
    # query doc (window over one doc's distinct terms — doc-bounded);
    # df rides along so the scoring join below never re-joins it
    wq = W.partitionBy("query_id").orderBy(F.asc("df"), F.asc("term"))
    qt = (
        q.join(tf, q.query_id == tf.doc_id)
        .join(df, "term")
        .select("query_id", "term", "df")
        .withColumn("_trn", F.row_number().over(wq))
        .where(F.col("_trn") <= QUERY_TERMS)
        .select("query_id", "term", "df")
    )

    cand = (
        qt.join(post, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("w"),
        )
    )
    agg = cand.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("w"), 6).alias("bm25")
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return agg.withColumn("rank", F.row_number().over(wr).cast("long")).where(
        F.col("rank") <= BM25_TOP_K
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the dense (cosine) and
# lexical (BM25) rankers.
# --------------------------------------------------------------------------

RRF_K = 60
RRF_SCALE = 10**9
RRF_TOP_K = 10

# embed both rankers' oracles as CTE chains; DuckDB evaluates the
# dense ranker's CTEs (from similarity.BRUTE_ORACLE) inside a derived
# table, keeping the two oracles textually independent.
RRF_ORACLE = f"""
WITH {_BM25_CTES},
lex AS (
  SELECT query_id, doc_id,
         CAST(round({RRF_SCALE} / ({RRF_K} + rank)) AS BIGINT) AS c_lex
  FROM bm25_ranked WHERE rank <= {BM25_TOP_K}
),
dense AS (
  SELECT query_id, neighbor_id AS doc_id,
         CAST(round({RRF_SCALE} / ({RRF_K} + rank)) AS BIGINT) AS c_dense
  FROM ({BRUTE_ORACLE}) t
),
fused AS (
  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         coalesce(l.doc_id, d.doc_id) AS doc_id,
         coalesce(l.c_lex, 0) + coalesce(d.c_dense, 0) AS rrf_score,
         CAST((CASE WHEN l.doc_id IS NULL THEN 0 ELSE 1 END)
            + (CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_systems
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
),
rrf_ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS BIGINT)
    AS rank
  FROM fused
)
SELECT query_id, doc_id, rrf_score, n_systems, rank
FROM rrf_ranked WHERE rank <= {RRF_TOP_K}
"""


@register(
    "retrieval_rrf_fusion",
    oracle=RRF_ORACLE,
    tags=("retrieval", "similarity", "ann", "hybrid"),
    bench=True,
    doc="Hybrid retrieval: reciprocal-rank fusion (Cormack et al. "
    "2009) of the dense cosine top-10 (ann_cosine_topk, vec_id "
    "queries) and the lexical BM25 top-10 (doc_bm25_topk, doc_id "
    "queries) — each doc's fused score is the sum over systems of "
    "round(1e9/(60+rank)) as integers, so the certification is "
    "hash-exact with no float discipline needed. The fusion joins two "
    "ALREADY-ranked top-k lists (<= 2k rows per query), so every "
    "stage past the two rankers is bounded by construction; queries "
    "ranked by only one system fuse from that list alone (documents "
    "and embeddings strides diverge above sf0.01).",
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure composition: both legs are the registered rankers'
    callables, so their certified plans (bounded query blocks,
    per-partition pruned kernels) are reused verbatim."""
    contrib = F.round(F.lit(RRF_SCALE) / (F.lit(RRF_K) + F.col("rank"))).cast(
        "long"
    )
    lex = doc_bm25_topk(spark, sf_dir).select(
        "query_id", "doc_id", contrib.alias("c_lex")
    )
    dense = ann_cosine_topk(spark, sf_dir).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        contrib.alias("c_dense"),
    )
    fused = (
        lex.withColumnRenamed("query_id", "lq")
        .withColumnRenamed("doc_id", "ld")
        .join(
            dense.withColumnRenamed("query_id", "dq").withColumnRenamed(
                "doc_id", "dd"
            ),
            (F.col("lq") == F.col("dq")) & (F.col("ld") == F.col("dd")),
            "full_outer",
        )
        .select(
            F.coalesce("lq", "dq").alias("query_id"),
            F.coalesce("ld", "dd").alias("doc_id"),
            (
                F.coalesce("c_lex", F.lit(0)) + F.coalesce("c_dense", F.lit(0))
            ).alias("rrf_score"),
            (
                F.when(F.col("ld").isNull(), 0).otherwise(1)
                + F.when(F.col("dd").isNull(), 0).otherwise(1)
            ).cast("long").alias("n_systems"),
        )
    )
    wr = W.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return fused.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    ).where(F.col("rank") <= RRF_TOP_K)
