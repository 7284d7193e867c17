"""Deterministic distinct-count sketches (north-star "novel sketch"
category): K-minimum-values (KMV) over md5 hashes.

Why KMV and not HyperLogLog: Spark's approx_count_distinct and
DuckDB's approx_count_distinct use different HLL implementations, so
an HLL estimate can never be hash-certified across engines. KMV's
state is just the k smallest md5 values of the distinct elements —
and md5 is identical everywhere — so the sketch, the estimate, and
the error are all bit-reproducible and the driver can certify the
whole estimator, exactly like the MinHash calibration query.

Estimator (Bar-Yossef et al. 2002, the classic KMV/bottom-k): with
U_(k) = the k-th smallest hash mapped to (0, 1],

    n_est = floor((k - 1) / U_(k))        (n_est = n_exact when the
                                           group has < k distinct
                                           elements — the sketch is
                                           then lossless)

U_(k) uses the first 8 hex chars (32 bits) + 1 to stay strictly
positive; both engines compute the identical integer so the division
is the identical double.

Scale design (100 TB): the k-smallest selection per group runs
through functions/selection.py's bucket-histogram machinery — one
map-side-combined histogram shuffle, then only the boundary bucket's
sliver is sorted. No per-group full sort anywhere; the exact
distinct count (emitted alongside for calibration) is the one
corpus-sized aggregate, and a production deployment would drop it
and keep only the O(k) sketch per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.selection import (
    hash_bucket,
    select_first_by_hash,
)
from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

KMV_K = 256

# portable hex->int for the first 8 hash chars (DuckDB has no conv())
_HEXVAL_DUCK = " + ".join(
    f"(strpos('0123456789abcdef', substring(kth, {i + 1}, 1)) - 1) "
    f"* {16 ** (7 - i)}"
    for i in range(8)
)

KMV_ORACLE = f"""
WITH toks AS (
  SELECT lang,
         list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'),
                     x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT lang,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS el
  FROM toks WHERE len(t) >= 3
),
el AS (SELECT DISTINCT lang, md5(el) AS h FROM sh),
ranked AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM el
),
sk AS (
  SELECT lang, max(h) AS kth, CAST(count(*) AS BIGINT) AS n_sketch
  FROM ranked WHERE rn <= {KMV_K} GROUP BY lang
),
ex AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_exact FROM el GROUP BY lang)
SELECT e.lang, e.n_exact,
       CASE WHEN s.n_sketch < {KMV_K} THEN s.n_sketch
            ELSE CAST(floor(({KMV_K} - 1)
                 / ((({_HEXVAL_DUCK}) + 1) / 4294967296.0)) AS BIGINT)
       END AS n_est,
       round(abs(CASE WHEN s.n_sketch < {KMV_K} THEN s.n_sketch
                      ELSE CAST(floor(({KMV_K} - 1)
                           / ((({_HEXVAL_DUCK}) + 1) / 4294967296.0)) AS BIGINT)
                 END - e.n_exact) / e.n_exact, 4) AS rel_err
FROM ex e JOIN sk s ON s.lang = e.lang
"""


@register(
    "sketch_kmv_distinct",
    oracle=KMV_ORACLE,
    tags=("sketch", "approximate", "text"),
    doc=f"KMV (bottom-{KMV_K}) distinct-shingle sketch per language "
    "(3-word shingles — thousands of distinct elements per group, so "
    "the estimator branch is exercised, unlike the 31-word synthetic "
    "token vocabulary): the k smallest md5 values give "
    "n_est = (k-1)/U_(k), emitted next to the exact distinct count "
    "and the relative error. md5 order is engine-independent, so "
    "unlike HLL the whole estimator is hash-certifiable; the "
    "k-smallest selection runs through the bucket-histogram machinery "
    "(functions/selection.py), never a per-group full sort.",
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    toks = docs.select("lang", words("text").alias("t")).where(F.size("t") >= 3)
    el = (
        toks.select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2), i -> "
                    "concat_ws(' ', element_at(t, i), element_at(t, i + 1), "
                    "element_at(t, i + 2)))"
                )
            ).alias("el"),
        )
        .select("lang", F.md5("el").alias("h"))
        .distinct()
    )
    bucketed = el.withColumn("_bkt", hash_bucket(F.col("h")))
    sel = select_first_by_hash(
        bucketed, ["lang"], F.lit(KMV_K), [F.col("h")]
    )
    sk = sel.groupBy("lang").agg(
        F.max("h").alias("kth"), F.count("*").alias("n_sketch")
    )
    ex = el.groupBy("lang").agg(F.count("*").alias("n_exact"))
    u = (F.conv(F.substring("kth", 1, 8), 16, 10).cast("long") + 1) / F.lit(
        4294967296.0
    )
    est = F.when(F.col("n_sketch") < KMV_K, F.col("n_sketch")).otherwise(
        F.floor(F.lit(KMV_K - 1) / u).cast("long")
    )
    return ex.join(sk, "lang").select(
        "lang",
        "n_exact",
        est.alias("n_est"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )
