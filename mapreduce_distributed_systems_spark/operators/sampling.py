"""Deterministic sampling & dataset-split operators for training-data
pipelines (north star).

Sampling for 100 TB corpora must be content-addressed, not RNG-based:
a hash-derived sample is (a) reproducible across engines/runs, (b)
stable under re-partitioning, (c) consistent between incremental runs
over growing data. All operators key on the first 4 hex chars of
md5(id) interpreted as a 16-bit bucket (identical in Spark and
DuckDB), giving 65536 assignment buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.selection import (
    hash_bucket,
    select_first_by_hash,
)
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

# 16-bit bucket from md5 of the id — portable hex->int arithmetic
_BUCKET_SPARK = (
    "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1) * 4096 + "
    "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1) * 256 + "
    "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 3, 1)) - 1) * 16 + "
    "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 4, 1)) - 1)"
)
_BUCKET_DUCK = _BUCKET_SPARK.replace("instr(", "strpos(").replace(
    "cast(doc_id as string)", "CAST(doc_id AS VARCHAR)"
)

SAMPLE_PCT_BUCKETS = 6554  # ~10% of 65536

SAMPLE_ORACLE = f"""
SELECT doc_id, source, lang
FROM documents
WHERE {_BUCKET_DUCK} < {SAMPLE_PCT_BUCKETS}
"""


@register(
    "sample_deterministic_10pct",
    oracle=SAMPLE_ORACLE,
    tags=("sampling", "pipeline"),
    doc="Content-addressed ~10% sample: md5-bucket of doc_id < 6554/65536 "
    "— reproducible across engines, runs, and partitionings.",
)
def sample_deterministic_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(F.expr(_BUCKET_SPARK) < SAMPLE_PCT_BUCKETS).select(
        "doc_id", "source", "lang"
    )


SPLIT_ORACLE = f"""
SELECT doc_id,
       CASE WHEN {_BUCKET_DUCK} < 58982 THEN 'train'
            WHEN {_BUCKET_DUCK} < 62259 THEN 'valid'
            ELSE 'test' END AS split
FROM documents
"""


@register(
    "dataset_split_assign",
    oracle=SPLIT_ORACLE,
    tags=("sampling", "pipeline"),
    doc="Stable train/valid/test assignment (~90/5/5) from the same "
    "md5 bucket — membership never changes as the corpus grows.",
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = F.expr(_BUCKET_SPARK)
    return docs.select(
        "doc_id",
        F.when(b < 58982, "train").when(b < 62259, "valid").otherwise("test").alias(
            "split"
        ),
    )


STRATIFIED_ORACLE = f"""
SELECT lang, doc_id
FROM (
  SELECT lang, doc_id,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY {_BUCKET_DUCK}, doc_id) AS BIGINT) AS rk
  FROM documents
)
WHERE rk <= 20
"""


@register(
    "stratified_sample_per_lang",
    oracle=STRATIFIED_ORACLE,
    tags=("sampling", "pipeline"),
    doc="Stratified sample: 20 docs per language, chosen by hash order "
    "(deterministic, balanced across strata regardless of skew). The "
    "round-2 plan windowed over the whole corpus partitioned by lang "
    "(~5 strata -> one reducer sorts each stratum); round 3 selects "
    "through the bucket-histogram threshold (functions/selection.py), "
    "so the per-lang row_number only ever sees one md5-bucket's "
    "sliver — exact at any corpus size, no pre-filter threshold to "
    "tune.",
)
def stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "doc_id")
        .withColumn("_bkt", hash_bucket(F.md5(F.col("doc_id").cast("string"))))
    )
    picked = select_first_by_hash(
        docs,
        group_cols=["lang"],
        quota=F.lit(20),
        order_cols=[F.col("doc_id")],
    )
    return picked.select("lang", "doc_id")


PROFILE_ORACLE = """
SELECT 'o_orderkey' AS column_name,
       count(*) AS n, count(DISTINCT o_orderkey) AS n_distinct,
       CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
       round(min(o_orderkey), 4) AS min_v, round(max(o_orderkey), 4) AS max_v
FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(DISTINCT o_custkey),
       CAST(count(*) - count(o_custkey) AS BIGINT),
       round(min(o_custkey), 4), round(max(o_custkey), 4)
FROM orders
UNION ALL
SELECT 'o_totalprice', count(*), count(DISTINCT o_totalprice),
       CAST(count(*) - count(o_totalprice) AS BIGINT),
       round(min(o_totalprice), 4), round(max(o_totalprice), 4)
FROM orders
"""


@register(
    "profile_orders",
    oracle=PROFILE_ORACLE,
    tags=("profiling", "pipeline"),
    doc="Column profiler over orders (count/distinct/nulls/min/max per "
    "column) — one scan, all profiles as a union of aggregates.",
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def prof(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("column_name"),
            F.count("*").alias("n"),
            F.countDistinct(col).alias("n_distinct"),
            (F.count("*") - F.count(col)).cast("long").alias("n_null"),
            F.round(F.min(col), 4).cast("double").alias("min_v"),
            F.round(F.max(col), 4).cast("double").alias("max_v"),
        )

    return prof("o_orderkey").unionByName(prof("o_custkey")).unionByName(
        prof("o_totalprice")
    )


# --------------------------------------------------------------------------
# Train/eval decontamination (round 4): the LLM-pipeline check that no
# evaluation document leaks into the training split. Detection is on
# the NORMALIZED content hash (casefold + whitespace-collapse — the
# same normalization dedup_exact_normalized certifies), joined across
# the split boundary. The corpus re-uses dedup_exact_normalized's
# deterministic planted variants so the contamination branch provably
# emits rows at any sf (the raw corpus has no byte-identical texts).
#
# Scale note (100 TB): the join key is a 16-byte hash; the eval side
# is ~10% of the corpus by construction, so the join shuffles hashes
# only — and in a real deployment the eval set is small enough to
# broadcast, making decontamination a narrow map over training data.
# --------------------------------------------------------------------------

_NORM_HASH_SPARK = "md5(lower(trim(regexp_replace(text, '\\\\s+', ' '))))"
_NORM_HASH_DUCK = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"

DECONTAMINATION_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
         '  ' || upper(text) || '   '
  FROM documents WHERE doc_id % 7 = 0
),
labeled AS (
  SELECT doc_id,
         {_NORM_HASH_DUCK} AS content_hash,
         CASE WHEN {_BUCKET_DUCK} < 58982 THEN 'train'
              WHEN {_BUCKET_DUCK} < 62259 THEN 'valid'
              ELSE 'test' END AS split
  FROM corpus
)
SELECT t.doc_id AS train_doc_id,
       e.doc_id AS eval_doc_id,
       e.split AS eval_split,
       t.content_hash
FROM labeled t
JOIN labeled e ON e.content_hash = t.content_hash AND e.split <> 'train'
WHERE t.split = 'train'
"""


@register(
    "corpus_decontamination",
    oracle=DECONTAMINATION_ORACLE,
    tags=("sampling", "pipeline", "dedup", "decontamination"),
    bench=True,  # round-5: first wall-clock/io record for decontamination
    doc="Train/eval decontamination: every (train doc, eval doc) pair "
    "sharing a normalized content hash across the deterministic "
    "90/5/5 split boundary — the leakage check a training pipeline "
    "runs before shipping a dataset. Planted casefold/whitespace "
    "variants guarantee the contamination branch is non-vacuous at "
    "any sf; the join key is the 16-byte normalized hash.",
)
def corpus_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # planted ids shift by max(doc_id) + 1 — disjoint from genuine ids
    # at ANY corpus scale (a fixed additive constant would collide
    # once ids outgrow it); the broadcast scalar costs one O(1) agg
    shift = docs.agg((F.max("doc_id") + F.lit(1)).alias("_s"))
    planted = (
        docs.where(F.col("doc_id") % 7 == 0)
        .crossJoin(F.broadcast(shift))
        .select(
            (F.col("doc_id") + F.col("_s")).alias("doc_id"),
            F.concat(F.lit("  "), F.upper("text"), F.lit("   ")).alias("text"),
        )
    )
    corpus = docs.unionByName(planted)
    b = F.expr(_BUCKET_SPARK)
    labeled = corpus.select(
        "doc_id",
        F.expr(_NORM_HASH_SPARK).alias("content_hash"),
        F.when(b < 58982, "train")
        .when(b < 62259, "valid")
        .otherwise("test")
        .alias("split"),
    )
    train = labeled.where(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc_id"), "content_hash"
    )
    ev = labeled.where(F.col("split") != "train").select(
        F.col("doc_id").alias("eval_doc_id"),
        F.col("split").alias("eval_split"),
        "content_hash",
    )
    return train.join(ev, "content_hash").select(
        "train_doc_id", "eval_doc_id", "eval_split", "content_hash"
    )


DECON_SPLIT_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
         '  ' || upper(text) || '   '
  FROM documents WHERE doc_id % 7 = 0
),
labeled AS (
  SELECT doc_id,
         {_NORM_HASH_DUCK} AS content_hash,
         CASE WHEN {_BUCKET_DUCK} < 58982 THEN 'train'
              WHEN {_BUCKET_DUCK} < 62259 THEN 'valid'
              ELSE 'test' END AS split
  FROM corpus
),
flags AS (
  SELECT content_hash,
         bool_or(split = 'train') AND bool_or(split <> 'train') AS leaked
  FROM labeled GROUP BY content_hash
)
SELECT l.doc_id, l.split, f.leaked,
       CASE WHEN l.split = 'train' AND f.leaked
            THEN 'quarantine' ELSE 'keep' END AS disposition
FROM labeled l JOIN flags f USING (content_hash)
"""


@register(
    "pipeline_decontaminated_split",
    oracle=DECON_SPLIT_ORACLE,
    tags=("sampling", "pipeline", "decontamination", "composition"),
    bench=True,  # round-7 session 2: headline set tracks the split artifact
    doc="The shippable training-prep artifact the decontamination CHECK "
    "feeds: one row per document with its deterministic 90/5/5 split, "
    "a `leaked` flag (normalized content hash present on BOTH sides "
    "of the train/eval boundary), and the disposition — train docs "
    "matching any eval doc are QUARANTINED (train is decontaminated "
    "against the benchmark; the benchmark itself stays fixed). "
    "Composition of dataset_split_assign + corpus_decontamination "
    "semantics with the same planted normalized variants (the "
    "contamination branch never certifies vacuously). Plan: map-only "
    "hash+bucket labeling, ONE map-side-combined groupBy(content_hash) "
    "computing per-hash side flags (bounded payload: two booleans), "
    "and a hash-keyed join back — no pair fan-out at all, unlike the "
    "reporting query, so the artifact path is strictly cheaper than "
    "the audit path at 100 TB.",
)
def pipeline_decontaminated_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shift = docs.agg((F.max("doc_id") + F.lit(1)).alias("_s"))
    planted = (
        docs.where(F.col("doc_id") % 7 == 0)
        .crossJoin(F.broadcast(shift))
        .select(
            (F.col("doc_id") + F.col("_s")).alias("doc_id"),
            F.concat(F.lit("  "), F.upper("text"), F.lit("   ")).alias("text"),
        )
    )
    corpus = docs.unionByName(planted)
    b = F.expr(_BUCKET_SPARK)
    labeled = corpus.select(
        "doc_id",
        F.expr(_NORM_HASH_SPARK).alias("content_hash"),
        F.when(b < 58982, "train")
        .when(b < 62259, "valid")
        .otherwise("test")
        .alias("split"),
    )
    flags = labeled.groupBy("content_hash").agg(
        (
            F.max((F.col("split") == "train").cast("int"))
            + F.max((F.col("split") != "train").cast("int"))
            == 2
        ).alias("leaked")
    )
    return labeled.join(flags, "content_hash").select(
        "doc_id",
        "split",
        "leaked",
        F.when((F.col("split") == "train") & F.col("leaked"), "quarantine")
        .otherwise("keep")
        .alias("disposition"),
    )


# N-gram (passage-level) decontamination — the industry-standard
# variant: an eval document is contaminated if any of its exact
# character windows appears in a training document (catches eval text
# EMBEDDED inside a larger training doc, which whole-document hashing
# misses). Window hashing is identical to dedup_repeated_passages
# (32-char windows, stride 16, md5); the shuffle carries 16-byte
# hashes only.

_PASSAGE_W = 32
_PASSAGE_STRIDE = 16

DECON_NGRAM_ORACLE = f"""
WITH labeled AS (
  SELECT doc_id, text,
         CASE WHEN {_BUCKET_DUCK} < 58982 THEN 'train'
              WHEN {_BUCKET_DUCK} < 62259 THEN 'valid'
              ELSE 'test' END AS split
  FROM documents
),
wins AS (
  SELECT DISTINCT doc_id, split,
         unnest(list_transform(
           range(1, greatest(length(text) - {_PASSAGE_W - 2}, 2) + 1, {_PASSAGE_STRIDE}),
           i -> md5(substring(text, i, {_PASSAGE_W})))) AS wh
  FROM labeled
),
tr AS (SELECT DISTINCT wh, doc_id FROM wins WHERE split = 'train'),
ev AS (SELECT doc_id, split, wh FROM wins WHERE split <> 'train')
SELECT ev.doc_id AS eval_doc_id,
       ev.split AS eval_split,
       CAST(count(DISTINCT ev.wh) AS BIGINT) AS n_contaminated_passages,
       CAST(count(DISTINCT tr.doc_id) AS BIGINT) AS n_train_docs
FROM ev JOIN tr ON tr.wh = ev.wh
GROUP BY ev.doc_id, ev.split
"""


@register(
    "corpus_decontamination_ngram",
    oracle=DECON_NGRAM_ORACLE,
    tags=("sampling", "pipeline", "dedup", "decontamination", "substring"),
    doc="Passage-level train/eval decontamination: an eval document is "
    "flagged when any of its exact 32-char windows (stride 16, md5 — "
    "the dedup_repeated_passages machinery) appears in ANY training "
    "document. Catches eval text embedded inside larger training "
    "docs, which whole-document hashing misses; per eval doc, the "
    "count of contaminated passages and of distinct offending "
    "training docs.",
)
def corpus_decontamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = F.expr(_BUCKET_SPARK)
    labeled = docs.select(
        "doc_id",
        "text",
        F.when(b < 58982, "train")
        .when(b < 62259, "valid")
        .otherwise("test")
        .alias("split"),
    )
    wins = labeled.select(
        "doc_id",
        "split",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {_PASSAGE_W - 2}, 2), "
                f"{_PASSAGE_STRIDE}), i -> md5(substring(text, i, {_PASSAGE_W})))"
            )
        ).alias("wh"),
    ).distinct()
    tr = (
        wins.where(F.col("split") == "train")
        .select(F.col("wh"), F.col("doc_id").alias("train_doc_id"))
        .distinct()
    )
    ev = wins.where(F.col("split") != "train").select(
        F.col("doc_id").alias("eval_doc_id"), F.col("split").alias("eval_split"), "wh"
    )
    return (
        ev.join(tr, "wh")
        .groupBy("eval_doc_id", "eval_split")
        .agg(
            F.count_distinct("wh").alias("n_contaminated_passages"),
            F.count_distinct("train_doc_id").alias("n_train_docs"),
        )
    )


# Fuzzy (MinHash-LSH) decontamination — the third rung of the
# decontamination ladder: whole-document hashing (corpus_decontamination)
# misses edits; passage hashing (corpus_decontamination_ngram) misses
# paraphrase-level rewording that still shares most shingles. The
# production check (GPT-3/PaLM-style "13-gram overlap" is the exact
# cousin; near-dup decon uses MinHash) flags an eval doc when it is
# NEAR-duplicate of any training doc. Reuses the dedup_minhash_lsh
# machinery wholesale: signatures off the raw shingle stream, band
# buckets, hot-bucket cap, sid-keyed exact-Jaccard verification —
# except the bucket join here is train-side x eval-side (two disjoint
# streams), never a self-join. Planted near-dups (train text + a
# 3-token tail, forced into the eval split by sign (planted id = -doc_id - 1)) guarantee the
# contamination branch is non-vacuous at any sf.

DECON_FUZZY_THRESHOLD = 0.5
# Planted eval ids are the NEGATION of their source id (-doc_id - 1):
# genuine ids are non-negative at any corpus scale, so sign-based
# disjointness never breaks — the same argument as the bloom probe
# set's negated keys (sketches.py). An additive shift (+2e7) would
# collide with genuine ids once the corpus outgrows the constant.
_FUZZY_SPLIT_DUCK = f"""CASE WHEN doc_id < 0 THEN 'test'
              WHEN {_BUCKET_DUCK} < 58982 THEN 'train'
              WHEN {_BUCKET_DUCK} < 62259 THEN 'valid'
              ELSE 'test' END"""


def _fuzzy_oracle() -> str:
    from mapreduce_distributed_systems_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        N_PERMS,
        SID_DUCK,
    )

    mins = ", ".join(
        f"min(('0x' || substring(md5(shingle), {4 * i + 1}, 4))::BIGINT) AS h{i}"
        for i in range(N_PERMS)
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT -doc_id - 1, text || ' zq zq zq'
  FROM documents WHERE doc_id % 11 = 3
),
labeled AS (
  SELECT doc_id, text, {_FUZZY_SPLIT_DUCK} AS split FROM corpus
),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'), x -> x <> '') AS t
  FROM labeled
),
shraw AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS shingle
  FROM toks WHERE len(t) >= 3
),
sh AS (SELECT DISTINCT doc_id, {SID_DUCK} AS sid FROM shraw),
mh AS (SELECT doc_id, {mins} FROM shraw GROUP BY doc_id),
bands AS (
  SELECT doc_id, band,
         CASE band WHEN 0 THEN h0 * 65536 + h1 WHEN 1 THEN h2 * 65536 + h3
                   WHEN 2 THEN h4 * 65536 + h5 ELSE h6 * 65536 + h7 END AS bkey
  FROM mh, (SELECT unnest([0, 1, 2, 3]) AS band)
),
lb AS (SELECT b.doc_id, b.band, b.bkey, l.split
       FROM bands b JOIN labeled l USING (doc_id)),
tb0 AS (SELECT band, bkey, doc_id AS train_doc_id FROM lb WHERE split = 'train'),
small AS (SELECT band, bkey FROM tb0 GROUP BY band, bkey
          HAVING count(*) <= {LSH_BUCKET_CAP}),
tb AS (SELECT tb0.* FROM tb0 JOIN small USING (band, bkey)),
eb AS (SELECT band, bkey, doc_id AS eval_doc_id, split AS eval_split
       FROM lb WHERE split <> 'train'),
cand AS (SELECT DISTINCT train_doc_id, eval_doc_id, eval_split
         FROM tb JOIN eb USING (band, bkey)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.train_doc_id, c.eval_doc_id, c.eval_split, count(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.train_doc_id
  JOIN sh sb ON sb.doc_id = c.eval_doc_id AND sb.sid = sa.sid
  GROUP BY 1, 2, 3
),
pairs AS (
  SELECT eval_doc_id, eval_split,
         CAST(i AS DOUBLE) / (na.n + nb.n - i) AS j
  FROM inter
  JOIN sizes na ON na.doc_id = train_doc_id
  JOIN sizes nb ON nb.doc_id = eval_doc_id
  WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= {DECON_FUZZY_THRESHOLD}
)
SELECT eval_doc_id, eval_split,
       CAST(count(*) AS BIGINT) AS n_train_matches,
       round(max(j), 4) AS max_jaccard
FROM pairs GROUP BY 1, 2
"""


@register(
    "corpus_decontamination_fuzzy",
    oracle=_fuzzy_oracle(),
    bench=True,  # round-7: headline set tracks the fuzzy decon stage (VERDICT r6 item 4)
    tags=("sampling", "pipeline", "dedup", "decontamination", "lsh"),
    doc="Near-duplicate train/eval decontamination: an eval document "
    "is flagged when MinHash-LSH banding pairs it with a training "
    "document and the sid-exact Jaccard is >= 0.5 — catching "
    "reworded/extended leakage that whole-document and passage "
    "hashing miss. Per eval doc: matching-train-doc count and max "
    "Jaccard. The scale shape is dedup_minhash_lsh's: signatures off "
    "the raw shingle stream (no distinct), integer band keys only in "
    "the shuffle, hot train-side buckets capped at LSH_BUCKET_CAP, "
    "and the bucket join is train x eval (two disjoint streams — in "
    "production the eval side is small enough to broadcast, making "
    "the candidate step a narrow map over training bands). Planted "
    "tail-extended copies (forced into the eval split by sign (planted id = -doc_id - 1)) "
    "keep the contamination branch non-vacuous at any sf.",
)
def corpus_decontamination_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from mapreduce_distributed_systems_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        lsh_bands,
        minhash_signatures,
        shingle_hashes,
        shingle_id_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 11 == 3).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat("text", F.lit(" zq zq zq")).alias("text"),
    )
    corpus = docs.unionByName(planted)
    # split is a PURE FUNCTION of doc_id (planted ids land in 'test' by
    # sign), so band rows re-derive it in place — no label join
    split_col = (
        F.when(F.col("doc_id") < 0, "test")
        .when(F.expr(_BUCKET_SPARK) < 58982, "train")
        .when(F.expr(_BUCKET_SPARK) < 62259, "valid")
        .otherwise("test")
    )
    bands = lsh_bands(minhash_signatures(shingle_hashes(corpus))).withColumn(
        "split", split_col
    )
    train_b = (
        bands.where(F.col("split") == "train")
        .select("band", "bkey", F.col("doc_id").alias("train_doc_id"))
        .withColumn("bn", F.count("*").over(W.partitionBy("band", "bkey")))
        .where(F.col("bn") <= LSH_BUCKET_CAP)
        .drop("bn")
    )
    eval_b = bands.where(F.col("split") != "train").select(
        "band",
        "bkey",
        F.col("doc_id").alias("eval_doc_id"),
        F.col("split").alias("eval_split"),
    )
    cand = (
        train_b.join(eval_b, ["band", "bkey"])
        .select("train_doc_id", "eval_doc_id", "eval_split")
        .distinct()
    )
    # sid table feeds both verification sides and the size table —
    # bounded at (docs x distinct shingles), evicted at next query entry
    sh = shingle_id_table(corpus).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("doc_id").alias("train_doc_id"), "sid")
    sb = sh.select(F.col("doc_id").alias("eval_doc_id"), "sid")
    inter = (
        cand.join(sa, "train_doc_id")
        .join(sb, ["eval_doc_id", "sid"])
        .groupBy("train_doc_id", "eval_doc_id", "eval_split")
        .agg(F.count("*").alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("train_doc_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("eval_doc_id"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    pairs = (
        inter.join(na, "train_doc_id")
        .join(nb, "eval_doc_id")
        .where(jac >= DECON_FUZZY_THRESHOLD)
        .select("eval_doc_id", "eval_split", jac.alias("j"))
    )
    return pairs.groupBy("eval_doc_id", "eval_split").agg(
        F.count("*").cast("long").alias("n_train_matches"),
        F.round(F.max("j"), 4).alias("max_jaccard"),
    )


# ------------------------------------------------------------------ #
# DSIR-style importance selection (Xie et al. 2023, arXiv:2302.03169,
# "Data Selection for Language Models via Importance Resampling"): the
# pretraining-curation op that selects raw-corpus documents whose
# hashed n-gram distribution looks like a TARGET domain. Per document,
# the importance log-weight is sum_tokens ln(p_target(b)/q_raw(b))
# over hashed feature buckets b, with add-one smoothing; the selection
# keeps the top-N weights. (DSIR proper adds Gumbel noise for a
# without-replacement sample; the deterministic top-N is the
# certifiable variant, and a seeded Gumbel via md5 would slot into the
# same plan.)
# ------------------------------------------------------------------ #

DSIR_BUCKETS = 1024  # hashed unigram feature space
DSIR_TARGET_LANG = "en"  # the domain whose distribution we match
DSIR_KEEP = 100

DSIR_ORACLE = f"""
WITH tb AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(tok), 1, 15))::BIGINT % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, lang,
           unnest(regexp_split_to_array(text, '[^\\p{{L}}]+')) AS tok
    FROM documents
  )
  WHERE tok <> ''
),
bc AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n_raw,
         CAST(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_tgt
  FROM tb GROUP BY b
),
tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM bc),
w AS (
  SELECT b, ln((bc.n_tgt + 1.0) / (t.t_tgt + {DSIR_BUCKETS}))
           - ln((bc.n_raw + 1.0) / (t.t_raw + {DSIR_BUCKETS})) AS wb
  FROM bc CROSS JOIN tot t
),
dw AS (
  SELECT tb.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         round(sum(w.wb), 6) AS weight
  FROM tb JOIN w USING (b) GROUP BY tb.doc_id
)
SELECT doc_id, n_tokens, weight FROM dw
ORDER BY weight DESC, doc_id LIMIT {DSIR_KEEP}
"""


@register(
    "dsir_importance_select",
    oracle=DSIR_ORACLE,
    tags=("sampling", "quality", "curation", "dsir"),
    bench=True,  # round-8: headline tracks importance-based curation
    doc=f"DSIR importance selection (arXiv:2302.03169): score every "
    f"raw document by sum_tokens ln(p_target/q_raw) over "
    f"{DSIR_BUCKETS} hashed unigram buckets (target = lang="
    f"'{DSIR_TARGET_LANG}' docs, add-one smoothing) and keep the "
    f"top-{DSIR_KEEP} — domain-matching curation by importance "
    "weight, the op behind DoReMi/DSIR-style pretraining mixes. "
    "Plan: ONE token pass builds both distributions (groupBy bucket, "
    "map-side combined, bounded cardinality), the per-bucket "
    "log-ratio table broadcasts onto the token stream, and ONE "
    "doc-keyed map-side-combined shuffle sums per-doc weights; "
    "selection is TakeOrdered (no full sort). At 100 TB every "
    "exchange is either bucket-bounded or one row per (doc, "
    "partition).",
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_select(load_table(spark, sf_dir, "documents"))


def dsir_select(
    docs: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    keep: int = DSIR_KEEP,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The DSIR scoring/selection pipeline over any (doc_id, lang,
    text) frame — parameterized so tests can plant a target domain
    with a known vocabulary and assert the selection finds its
    lookalikes."""
    from mapreduce_distributed_systems_spark.functions.text import words

    tb = docs.select(
        "doc_id", "lang", F.explode(words("text")).alias("tok")
    ).select(
        "doc_id",
        "lang",
        F.expr(
            "cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"
            f" % {buckets}"
        ).alias("b"),
    )
    bc = tb.groupBy("b").agg(
        F.count("*").cast("long").alias("n_raw"),
        F.sum(
            F.when(F.col("lang") == target_lang, 1).otherwise(0)
        ).cast("long").alias("n_tgt"),
    )
    tot = bc.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    w = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("n_tgt") + 1.0) / (F.col("t_tgt") + buckets))
            - F.log((F.col("n_raw") + 1.0) / (F.col("t_raw") + buckets))
        ).alias("wb"),
    )
    dw = (
        tb.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.sum("wb"), 6).alias("weight"),
        )
    )
    return dw.orderBy(F.desc("weight"), F.asc("doc_id")).limit(keep)


# ------------------------------------------------------------------ #
# The "R" in DSIR: importance RESAMPLING via Gumbel-top-k. Selecting
# the top-N weights (dsir_importance_select) is the mode-seeking
# variant; the paper samples WITHOUT replacement with probability
# proportional to the importance weight, which is exactly Gumbel-top-k
# (Vieira 2014; Kool et al. 2019, arXiv:1903.06059): draw
# g_i = -ln(-ln(u_i)) per doc and keep the top-N of (log w_i + g_i).
# The noise is md5-seeded from doc_id — u_i = (h_i + 0.5) / 2^60 with
# h_i the first 15 hex chars of md5('gumbel:' || doc_id), offset 0.5 so
# u lands in the OPEN interval (0, 1): h = 2^60 - 1 with a +1 offset
# would give u = 1.0, where ln(-ln(u)) diverges engine-dependently
# (DuckDB raises, Spark yields NULL and silently drops the doc) — so the
# sample is deterministic, engine-replayable, and changes with the
# seed string, the repo-wide seeded-randomness pattern
# (sample_deterministic_10pct, epoch shuffles).
# ------------------------------------------------------------------ #

DSIR_GUMBEL_SEED = "gumbel8"

DSIR_GUMBEL_ORACLE = f"""
WITH tb AS (
  SELECT doc_id,
         ('0x' || substring(md5(tok), 1, 15))::BIGINT % {DSIR_BUCKETS} AS b,
         lang
  FROM (
    SELECT doc_id, lang,
           unnest(regexp_split_to_array(text, '[^\\p{{L}}]+')) AS tok
    FROM documents
  )
  WHERE tok <> ''
),
bc AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n_raw,
         CAST(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_tgt
  FROM tb GROUP BY b
),
tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM bc),
w AS (
  SELECT b, ln((bc.n_tgt + 1.0) / (t.t_tgt + {DSIR_BUCKETS}))
           - ln((bc.n_raw + 1.0) / (t.t_raw + {DSIR_BUCKETS})) AS wb
  FROM bc CROSS JOIN tot t
),
dw AS (
  SELECT tb.doc_id, sum(w.wb) AS logw
  FROM tb JOIN w USING (b) GROUP BY tb.doc_id
),
keyed AS (
  SELECT doc_id,
         round(logw - ln(-ln(
           (('0x' || substring(md5('{DSIR_GUMBEL_SEED}:' || doc_id), 1, 15))::BIGINT
            + 0.5) / 1152921504606846976.0
         )), 6) AS gumbel_key
  FROM dw
)
SELECT doc_id, gumbel_key FROM keyed
ORDER BY gumbel_key DESC, doc_id LIMIT {DSIR_KEEP}
"""


@register(
    "dsir_gumbel_resample",
    oracle=DSIR_GUMBEL_ORACLE,
    tags=("sampling", "quality", "curation", "dsir"),
    doc=f"DSIR importance RESAMPLING (the paper's actual sampler): a "
    f"without-replacement sample of {DSIR_KEEP} docs with probability "
    "proportional to the importance weight, via Gumbel-top-k "
    "(arXiv:1903.06059) — per doc, keep-key = log-weight + "
    "(-ln(-ln(u))) with u md5-seeded from doc_id, top-N by key. Same "
    "plan as dsir_importance_select plus one map-side expression; "
    "selection stays TakeOrdered. Deterministic and engine-replayed "
    "end-to-end, so the certified artifact is the SAMPLE itself — "
    "rerunnable anywhere, re-drawable by changing the seed string.",
)
def dsir_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_distributed_systems_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents")
    tb = docs.select(
        "doc_id", "lang", F.explode(words("text")).alias("tok")
    ).select(
        "doc_id",
        "lang",
        F.expr(
            "cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"
            f" % {DSIR_BUCKETS}"
        ).alias("b"),
    )
    bc = tb.groupBy("b").agg(
        F.count("*").cast("long").alias("n_raw"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).cast("long").alias("n_tgt"),
    )
    tot = bc.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    w = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("n_tgt") + 1.0) / (F.col("t_tgt") + DSIR_BUCKETS))
            - F.log((F.col("n_raw") + 1.0) / (F.col("t_raw") + DSIR_BUCKETS))
        ).alias("wb"),
    )
    dw = (
        tb.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.sum("wb").alias("logw"))
    )
    u = (
        F.expr(
            "cast(conv(substring("
            f"md5(concat('{DSIR_GUMBEL_SEED}:', cast(doc_id as string)))"
            ", 1, 15), 16, 10) as bigint)"
        )
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    keyed = dw.select(
        "doc_id",
        F.round(F.col("logw") - F.log(-F.log(u)), 6).alias("gumbel_key"),
    )
    return keyed.orderBy(F.desc("gumbel_key"), F.asc("doc_id")).limit(
        DSIR_KEEP
    )
