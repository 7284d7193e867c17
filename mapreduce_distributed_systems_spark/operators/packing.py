"""Training-shard packing and data-mixture sampling (north star):
the last mile of a pretraining pipeline — cleaned documents become
fixed-token-budget shards, and sources are re-weighted into the
training mixture.

- `pack_training_shards`: greedy sequential packing by ingest order:
  a doc goes to shard floor(start_offset / TOKEN_BUDGET) where
  start_offset is the cumulative token count of all earlier docs.
  The global running sum is computed DISTRIBUTED with the same
  range-partition + per-partition-offset machinery as the global rank
  in operators/windows.py — no single-partition window (the naive
  `sum() OVER (ORDER BY ...)` is the 100 TB anti-shape).
- `mixture_weighted_sample`: per-source keep-quota sampling in
  content-addressed (md5) order; quotas are computed in INTEGER
  arithmetic (ceil(n*k/5) as (n*k+4) div 5) so both engines pick the
  identical document set — float quota math rounds differently across
  engines. Selection is the bucket-histogram threshold of
  functions/selection.py: the only corpus-sized shuffle is a map-side
  combined (source, bucket) histogram; no per-source corpus window
  (a `row_number OVER (PARTITION BY source)` with ~5 sources would
  sort each source through ONE reducer — the round-2 scale defect,
  fixed in round 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.selection import (
    hash_bucket,
    select_first_by_hash,
)
from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

TOKEN_BUDGET = 5000  # tokens per training shard

PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'),
                              x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, n_tok,
         sum(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csum
  FROM t
)
SELECT doc_id, n_tok,
       CAST((csum - n_tok) // {TOKEN_BUDGET} AS BIGINT) AS shard_id
FROM c
"""


@register(
    "pack_training_shards",
    oracle=PACK_ORACLE,
    tags=("packing", "training-data"),
    bench=True,
    doc=f"Greedy sequential shard packing: doc -> shard "
    f"floor(start_token_offset / {TOKEN_BUDGET}). The global running "
    "token sum is distributed (range partition + per-partition offset "
    "from an O(#partitions) driver scalar) — no single-partition "
    "window anywhere in the plan.",
)
def pack_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(words("text")).cast("long").alias("n_tok")
    )
    packed = distributed_cumsum(spark, docs, "n_tok", ["doc_id"])
    return packed.select(
        "doc_id",
        "n_tok",
        F.expr(f"((_csum - n_tok) div {TOKEN_BUDGET})")
        .cast("long")
        .alias("shard_id"),
    )


def distributed_cumsum(
    spark: SparkSession, df: DataFrame, value_col: str, order_cols: list[str]
) -> DataFrame:
    """Global running sum of `value_col` in `order_cols` order WITHOUT
    a single-partition window: range-partition on the order, run the
    prefix sum per partition, then add each partition's starting
    offset (an O(#partitions) driver collect of per-partition totals).
    Returns the input plus a `_csum` column."""
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sums = {
        r["_pid"]: r["s"]
        for r in part.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += sums.get(pid, 0)
    off_map = F.create_map(
        *[F.lit(v) for pid in range(n_parts) for v in (pid, offsets[pid])]
    )
    w = W.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, 0
    )
    csum = F.element_at(off_map, F.col("_pid")) + F.sum(value_col).over(w)
    return part.withColumn("_csum", csum).drop("_pid")


MIXTURE_ORACLE = """
WITH counted AS (
  SELECT doc_id, source,
         CAST(substring(source, 4) AS INTEGER) AS sfx,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n_src
  FROM documents
)
SELECT doc_id, source
FROM counted
WHERE rn <= (n_src * (1 + sfx % 4) + 4) // 5
"""


@register(
    "mixture_weighted_sample",
    oracle=MIXTURE_ORACLE,
    tags=("sampling", "mixture", "training-data"),
    doc="Data-mixture sampling: each source keeps a quota of "
    "ceil(n * k / 5) docs (k = 1 + source_index mod 4, i.e. 20-80% "
    "weights) chosen in content-addressed md5 order. Quota arithmetic "
    "is pure-integer so both engines select the identical set. The "
    "selection runs through the bucket-histogram threshold "
    "(functions/selection.py): one map-side-combined histogram "
    "shuffle, a broadcast boundary join, and a row_number over only "
    "the boundary bucket's sliver — never a per-source window over "
    "the corpus.",
)
def mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = F.md5(F.col("doc_id").cast("string"))
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .withColumn("_h", h)
        .withColumn("_bkt", hash_bucket(F.col("_h")))
    )
    # k = 1 + source_index mod 4; quota = ceil(n_src * k / 5), integer
    quota = F.expr(
        "(_n_grp * (1 + cast(substring(source, 4) as int) % 4) + 4) div 5"
    )
    picked = select_first_by_hash(
        docs,
        group_cols=["source"],
        quota=quota,
        order_cols=[F.col("_h"), F.col("doc_id")],
    )
    return picked.select("doc_id", "source")


# --------------------------------------------------------------------------
# Training-prep composition (round 5): the packing-side sibling of
# pipeline_clean_corpus. A cleaned corpus still has to become training
# shards: take the TRAIN split (stable hash assignment), chunk long
# docs into overlapping fixed-token-budget units, pack the chunks
# sequentially into token-budget shards, and emit one certifiable row
# per shard whose shard_hash (md5 of the ordered chunk hashes) pins
# the exact chunk membership AND order — the strongest end-to-end
# signal: any drift in split, tokenization, chunk boundaries, packing
# order, or shard assignment changes the hash.
# --------------------------------------------------------------------------

TRAIN_PREP_ORACLE = None  # assigned below (needs sampling/text imports)


def _train_prep_oracle() -> str:
    from mapreduce_distributed_systems_spark.operators.sampling import (
        _BUCKET_DUCK,
    )
    from mapreduce_distributed_systems_spark.operators.text_analysis import (
        CHUNK_OVERLAP,
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    return f"""
WITH train AS (
  SELECT doc_id, text FROM documents WHERE {_BUCKET_DUCK} < 58982
),
t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'),
                     x -> x <> '') AS toks
  FROM train
),
s AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks) - {CHUNK_OVERLAP}, 1) + 1,
                      {CHUNK_STRIDE})) AS start
  FROM t WHERE len(toks) > 0
),
ch AS (
  SELECT doc_id,
         CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
         CAST(len(toks[start:start + {CHUNK_TOKENS - 1}]) AS BIGINT) AS n_tok,
         md5(array_to_string(toks[start:start + {CHUNK_TOKENS - 1}], ' '))
           AS chunk_hash
  FROM s
),
cs AS (
  SELECT *, sum(n_tok) OVER (ORDER BY doc_id, chunk_idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csum
  FROM ch
),
packed AS (
  SELECT *, CAST((csum - n_tok) // {TOKEN_BUDGET} AS BIGINT) AS shard_id
  FROM cs
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       md5(string_agg(chunk_hash, '' ORDER BY doc_id, chunk_idx))
         AS shard_hash
FROM packed GROUP BY shard_id
"""


TRAIN_PREP_ORACLE = _train_prep_oracle()


@register(
    "pipeline_training_prep",
    oracle=TRAIN_PREP_ORACLE,
    tags=("pipeline", "packing", "chunking", "training-data"),
    doc="End-to-end training-prep: stable train-split assignment -> "
    "overlapping fixed-token chunking -> sequential token-budget "
    "shard packing -> one row per shard with an order-sensitive "
    "shard_hash (md5 of the ordered chunk hashes). The hash certifies "
    "split membership, tokenization, chunk boundaries, packing order, "
    "and shard assignment in one value. The global packing order uses "
    "the distributed prefix sum (range partition + O(#partitions) "
    "offsets) — no single-partition window; per-shard collect_lists "
    "are bounded by the token budget.",
)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_distributed_systems_spark.operators.sampling import (
        _BUCKET_SPARK,
    )
    from mapreduce_distributed_systems_spark.operators.text_analysis import (
        chunk_rows,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.expr(_BUCKET_SPARK) < 58982
    )
    chunks = chunk_rows(docs).select(
        "doc_id", "chunk_idx", F.col("n_chunk_tokens").alias("n_tok"),
        "chunk_hash",
    )
    packed = distributed_cumsum(
        spark, chunks, "n_tok", ["doc_id", "chunk_idx"]
    ).withColumn(
        "shard_id", F.expr(f"((_csum - n_tok) div {TOKEN_BUDGET})").cast("long")
    )
    ordered_hashes = F.expr(
        "transform(sort_array(collect_list(struct(doc_id, chunk_idx, "
        "chunk_hash))), x -> x.chunk_hash)"
    )
    return packed.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.md5(F.concat_ws("", ordered_hashes)).alias("shard_hash"),
    )


# --------------------------------------------------------------------------
# Per-epoch deterministic corpus shuffle (round 5). Training over a
# packed corpus needs a DIFFERENT global permutation each epoch, and
# the permutation must be (a) reproducible bit-for-bit (resumable
# training, shard re-generation after node loss) and (b) computable
# without any single-point order assignment. Keyed md5(epoch:doc_id)
# gives (a); the distributed prefix-sum machinery gives (b): global
# position = range-partitioned per-partition rank + an O(#partitions)
# offset, identical to pack_training_shards' running sum — no
# SinglePartition window anywhere.
# --------------------------------------------------------------------------

SHUFFLE_EPOCHS = 3
EPOCH_SHARD_DOCS = 64

EPOCH_SHUFFLE_ORACLE = f"""
WITH e AS (SELECT unnest(range({SHUFFLE_EPOCHS})) AS epoch),
h AS (
  SELECT epoch, doc_id,
         md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS hh
  FROM documents, e
),
r AS (
  SELECT epoch, doc_id,
         row_number() OVER (PARTITION BY epoch ORDER BY hh, doc_id) AS pos
  FROM h
)
SELECT epoch, doc_id, CAST(pos AS BIGINT) AS pos,
       CAST((pos - 1) // {EPOCH_SHARD_DOCS} AS BIGINT) AS shard_id
FROM r
"""


@register(
    "training_epoch_shuffle",
    oracle=EPOCH_SHUFFLE_ORACLE,
    tags=("packing", "training-data", "shuffle"),
    doc=f"Deterministic per-epoch global shuffle: each of "
    f"{SHUFFLE_EPOCHS} epochs permutes the corpus by md5(epoch:doc_id) "
    "and assigns the contiguous position in that order (then "
    f"{EPOCH_SHARD_DOCS}-doc shards). The global position is computed "
    "with the distributed prefix-sum (range partition on the sort key "
    "+ per-partition rank + O(#partitions) offsets) — the plan has no "
    "SinglePartition window, so a 100 TB corpus reshuffles at full "
    "cluster width every epoch, and the keyed hash makes every "
    "epoch's permutation reproducible for resume/regeneration.",
)
def training_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = F.broadcast(
        spark.range(SHUFFLE_EPOCHS).select(F.col("id").alias("epoch"))
    )
    hdf = (
        docs.crossJoin(epochs)
        .select(
            "epoch",
            "doc_id",
            F.md5(
                F.concat(
                    F.col("epoch").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ).alias("hh"),
        )
        .withColumn("_one", F.lit(1))
    )
    cum = distributed_cumsum(spark, hdf, "_one", ["epoch", "hh", "doc_id"])
    n = docs.agg(F.count("*").alias("_n"))
    pos = F.col("_csum") - F.col("epoch") * F.col("_n")
    return cum.crossJoin(F.broadcast(n)).select(
        "epoch",
        "doc_id",
        pos.cast("long").alias("pos"),
        ((pos - 1) / EPOCH_SHARD_DOCS).cast("long").alias("shard_id"),
    )


# --------------------------------------------------------------------------
# Temperature-balanced mixture (alpha = 0.5): the multilingual
# up-sampling rule (XLM-R, arXiv:1911.02116 §3.1; mT5, Llama
# pretraining mixes): sample sources proportional to n^alpha so
# low-resource sources are over-represented relative to proportional
# sampling. alpha = 1/2 makes the weight integer-exact in BOTH
# engines: w_src = floor(sqrt(n_src)) (double sqrt is exactly rounded
# and consecutive squares are >> 1 ulp apart below 2^52), quotas are
# pure integer arithmetic on (keep_total, w_src, sum_w).
# --------------------------------------------------------------------------

MIX_TEMP_ORACLE = """
WITH sc AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
gl AS (
  SELECT CAST(sum(CAST(floor(sqrt(n)) AS BIGINT)) AS BIGINT) AS sw,
         CAST((sum(n) * 2) // 5 AS BIGINT) AS keep_total
  FROM sc
),
counted AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         CAST(floor(sqrt(count(*) OVER (PARTITION BY source))) AS BIGINT)
           AS w
  FROM documents
)
SELECT doc_id, source
FROM counted CROSS JOIN gl
WHERE rn <= (gl.keep_total * w) // gl.sw
"""


@register(
    "mixture_temperature_sample",
    oracle=MIX_TEMP_ORACLE,
    tags=("sampling", "mixture", "training-data"),
    doc="Temperature-balanced mixture sampling (alpha = 0.5, the "
    "XLM-R/mT5 multilingual up-sampling rule): keep a 40% document "
    "budget split across sources proportional to "
    "floor(sqrt(n_src)) instead of n_src, so small sources are "
    "over-represented exactly as the temperature schedule prescribes. "
    "Weights and quotas are pure integer arithmetic (isqrt is exact "
    "in both engines below 2^52), the global (sum_w, keep_total) "
    "scalars come from one bounded per-source count collect (#sources "
    "rows — the kmeans-collect shape), and the selection runs through "
    "the bucket-histogram threshold machinery: one map-side-combined "
    "histogram shuffle, broadcast boundary, row_number over the "
    "boundary sliver only — never a per-source window over the "
    "corpus. Content-addressed md5 order makes the kept set stable "
    "under repartitioning and reruns.",
)
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    h = F.md5(F.col("doc_id").cast("string"))
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .withColumn("_h", h)
        .withColumn("_bkt", hash_bucket(F.col("_h")))
    )
    counts = docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    sw = sum(math.isqrt(r["n"]) for r in counts)
    total = sum(r["n"] for r in counts)
    keep_total = (total * 2) // 5
    quota = F.expr(
        f"({keep_total}L * cast(floor(sqrt(_n_grp)) as bigint)) div {sw}L"
    )
    picked = select_first_by_hash(
        docs,
        group_cols=["source"],
        quota=quota,
        order_cols=[F.col("_h"), F.col("doc_id")],
    )
    return picked.select("doc_id", "source")
