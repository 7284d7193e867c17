"""64-bit SimHash near-dup detection (production-width variant of
`dedup_simhash`, SURVEY.md §2.D / north-star dedup family).

The 64-bit signature is carried as TWO 32-bit halves (`sim_hi`,
`sim_lo`) rather than one BIGINT:

- signed-64 semantics differ subtly between engines at bit 63
  (shift overflow, arithmetic vs logical right shift), while 32-bit
  values held in BIGINTs are portable everywhere;
- hamming distance decomposes exactly: bit_count(xor(hi_a, hi_b)) +
  bit_count(xor(lo_a, lo_b));
- the four 16-bit LSH bands are two bands per half — identical
  extraction arithmetic in Spark and DuckDB.

Per-token bits come from the first 16 hex chars of md5(token) (the
same content-addressed scheme the 16-bit variant slices 4 chars from),
parsed with one `conv(hex, 16, 10)` call per half, so both engines
derive identical signatures.

Recall bound (Manku et al., WWW'07): with 4 disjoint 16-bit bands,
the pigeonhole principle guarantees that any pair within hamming
distance 3 leaves at least one band untouched, i.e. collides in at
least one bucket — recall is EXACT for t = HAMMING_MAX64 = 3. (t > 3
would need permuted band tables; pairs at distance 4+ whose differing
bits span all four bands would silently be missed.)

Scale design (100 TB): the doc -> signature stage is a narrow
tokenize + groupBy(doc_id, tok) term-weight count + ONE
groupBy(doc_id) carrying 64 conditional-sum aggregates (all map-side
combinable; no per-bit row explode anywhere). What shuffles afterwards
is only (doc_id, two ints) exploded into 4 band rows. The candidate
join is an equi-join on (band, 16-bit key) — the classic
Charikar-style near-dup pipeline, never a cross join. With 4 bands of
16 bits a corpus of N docs spreads over ~65k buckets per band; skewed
buckets (boilerplate docs) are bounded by the band key's 16-bit
cardinality and AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

# 4 disjoint 16-bit bands guarantee recall only up to hamming 3
# (pigeonhole) — see module docstring.
HAMMING_MAX64 = 3


def _bit_sum_aggs_spark() -> list[F.Column]:
    """64 conditional-sum aggregates c_{half}_{bit}: +w when the bit is
    set in the token hash half, -w otherwise."""
    aggs = []
    for half, col in (("hi", "val_hi"), ("lo", "val_lo")):
        for b in range(32):
            aggs.append(
                F.sum(
                    F.when(
                        F.expr(f"({col} & {1 << b}L) != 0"), F.col("w")
                    ).otherwise(-F.col("w"))
                ).alias(f"c_{half}_{b}")
            )
    return aggs


def _half_expr(half: str) -> str:
    """sim_<half> = sum over bits of 2^b where the contribution is
    positive (same expression text works in Spark SQL and DuckDB)."""
    return " + ".join(
        f"(CASE WHEN c_{half}_{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(32)
    )


def simhash64_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sim_hi, sim_lo): weighted 64-bit SimHash, halves as
    32-bit values. One md5 + two conv() parses per distinct
    (doc, token); per-bit contributions are 64 conditional sums in a
    single groupBy(doc_id) — all built-in expressions, no UDFs, no
    row explosion."""
    tok_w = (
        docs.select("doc_id", F.explode(words("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("w"))
        .withColumn("h", F.md5("tok"))
        # hi = first 8 hex chars, lo = next 8 (32 bits each)
        .withColumn("val_hi", F.expr("cast(conv(substring(h, 1, 8), 16, 10) as bigint)"))
        .withColumn("val_lo", F.expr("cast(conv(substring(h, 9, 8), 16, 10) as bigint)"))
    )
    contrib = tok_w.groupBy("doc_id").agg(*_bit_sum_aggs_spark())
    return contrib.select(
        "doc_id",
        F.expr(_half_expr("hi")).cast("bigint").alias("sim_hi"),
        F.expr(_half_expr("lo")).cast("bigint").alias("sim_lo"),
    )


def _bit_sum_aggs_duck() -> str:
    terms = []
    for half, col in (("hi", "val_hi"), ("lo", "val_lo")):
        for b in range(32):
            terms.append(
                f"sum(CASE WHEN ({col} & {1 << b}) != 0 THEN w ELSE -w END)"
                f" AS c_{half}_{b}"
            )
    return ",\n         ".join(terms)


SIMHASH64_ORACLE = f"""
WITH tok_w AS (
  SELECT doc_id, tok, count(*) AS w, md5(tok) AS h
  FROM (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(text, '[^\\p{{L}}]+'),
                              x -> x <> '')) AS tok
    FROM documents
  )
  GROUP BY doc_id, tok
),
vals AS (
  SELECT doc_id, w,
         ('0x' || substring(h, 1, 8))::BIGINT AS val_hi,
         ('0x' || substring(h, 9, 8))::BIGINT AS val_lo
  FROM tok_w
),
contrib AS (
  SELECT doc_id,
         {_bit_sum_aggs_duck()}
  FROM vals GROUP BY doc_id
),
sig AS (
  SELECT doc_id,
         CAST({_half_expr("hi")} AS BIGINT) AS sim_hi,
         CAST({_half_expr("lo")} AS BIGINT) AS sim_lo
  FROM contrib
),
bands AS (
  SELECT doc_id, sim_hi, sim_lo, k,
         ((CASE WHEN k < 2 THEN sim_lo ELSE sim_hi END)
           // (1::BIGINT << (16 * (k % 2)))) % 65536 AS bkey
  FROM sig, (SELECT unnest(range(0, 4)) AS k)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sim_hi AS hi_a, a.sim_lo AS lo_a,
         b.sim_hi AS hi_b, b.sim_lo AS lo_b
  FROM bands a JOIN bands b
    ON a.k = b.k AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS BIGINT)
         AS hamming
FROM cand
WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= {HAMMING_MAX64}
"""


@register(
    "dedup_simhash64",
    oracle=SIMHASH64_ORACLE,
    tags=("dedup", "simhash"),
    bench=True,
    doc="Production-width 64-bit SimHash near-dup: weighted signature "
    "as two portable 32-bit halves, 4x16-bit band bucket join with "
    "exact recall at hamming <= 3 (pigeonhole), decomposed hamming "
    "filter (Manku et al. WWW'07 shape).",
)
def dedup_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cached: the band self-join would otherwise recompute the whole
    # token pipeline (explode + 64 conditional sums) for its second
    # input — the signature table is 3 longs per doc (round 5; no
    # bucket cap exists here, so the capped collect_list pair
    # formulation used by MinHash-LSH does not apply)
    sig = simhash64_signatures(load_table(spark, sf_dir, "documents")).cache()
    bands = sig.select(
        "doc_id",
        "sim_hi",
        "sim_lo",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
    ).withColumn(
        "bkey",
        F.expr(
            "((CASE WHEN k < 2 THEN sim_lo ELSE sim_hi END) "
            "div shiftleft(1L, 16 * (k % 2))) % 65536"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sim_hi").alias("hi_a"),
            F.col("a.sim_lo").alias("lo_a"),
            F.col("b.sim_hi").alias("hi_b"),
            F.col("b.sim_lo").alias("lo_b"),
        )
        .distinct()
    )
    hamming = F.expr(
        "cast(bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b) as bigint)"
    )
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= HAMMING_MAX64)
        .select("doc_a", "doc_b", "hamming")
    )


# --------------------------------------------------------------------------
# Cross-method agreement report: MinHash-LSH pairs vs SimHash64 pairs.
# The two near-dup detectors answer subtly different questions (set
# Jaccard over 3-shingles vs weighted-feature cosine via hamming), so
# a production pipeline that runs one should know how much of the
# other's signal it is giving up — this is the calibration table that
# decision gets made from, certified end-to-end since both pair
# generators are themselves oracle-replayable.
# --------------------------------------------------------------------------

def _method_agreement_oracle() -> str:
    from mapreduce_distributed_systems_spark.operators.dedup import (
        MINHASH_ORACLE,
    )

    return f"""
WITH a AS (SELECT doc_a, doc_b FROM ({MINHASH_ORACLE}) mh),
b AS (SELECT doc_a, doc_b FROM ({SIMHASH64_ORACLE}) sh),
i AS (SELECT doc_a, doc_b FROM a INTERSECT SELECT doc_a, doc_b FROM b),
u AS (SELECT doc_a, doc_b FROM a UNION SELECT doc_a, doc_b FROM b)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_minhash,
       (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_simhash,
       (SELECT CAST(count(*) AS BIGINT) FROM i) AS n_both,
       (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_either,
       round(CASE WHEN (SELECT count(*) FROM u) = 0 THEN 0.0
             ELSE (SELECT count(*) FROM i) * 1.0 /
                  (SELECT count(*) FROM u) END, 4) AS agreement
"""


@register(
    "dedup_method_agreement",
    oracle=_method_agreement_oracle(),
    tags=("dedup", "calibration", "report"),
    bench=True,  # round-8: highest 10x ratio in the session-3 set (2.22x) — tracked
    doc="Cross-method near-dup calibration: the MinHash-LSH pair set "
    "vs the SimHash64 pair set as one report row — per-method counts, "
    "the shared-pair count, and pair-set Jaccard agreement. The "
    "decision table for 'which detector do we run at 100 TB': both "
    "generators keep their own certified plans (banded bucket joins, "
    "never all-pairs), the comparison is two report-sized pair frames "
    "joined on (doc_a, doc_b), and both engines replay the ENTIRE "
    "two-method chain, so the agreement number itself is "
    "hash-certified. Driver-side counts are bounded (pair sets are "
    "report-sized by the LSH/hamming thresholds).",
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    from concurrent.futures import ThreadPoolExecutor

    from mapreduce_distributed_systems_spark.operators.dedup import (
        dedup_minhash_lsh,
    )

    # report-sized pair frames, persisted: the actions below would
    # otherwise each re-run the banded pipelines.
    mh = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").persist()
    sh = dedup_simhash64(spark, sf_dir).select("doc_a", "doc_b").persist()
    # The two generators share NOTHING (different signatures, different
    # band joins), so their materializing counts run as concurrent
    # driver-thread jobs (guide §2.6): each pipeline's tail back-fills
    # cores the other's barrier leaves idle, and Catalyst
    # analysis/planning of the two big plans overlaps too (probe_jobs
    # r13: ~3.3 s of the warm wall was sequential pre-job planning
    # gaps). Independent jobs, same counts — results unchanged.
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_mh, f_sh = pool.submit(mh.count), pool.submit(sh.count)
        n_mh, n_sh = f_mh.result(), f_sh.result()
    # intersection + union sizes in ONE job over the persisted
    # report-sized frames: both pair sets are unique by construction
    # (mh is a groupBy output, sh a distinct), so a full-outer join on
    # the pair key has exactly |union| rows of which |intersection|
    # match both sides — replacing the former join-count + separate
    # union-distinct-count pair of jobs with one (same two numbers).
    row = (
        mh.withColumn("_a", F.lit(1))
        .join(
            sh.withColumn("_b", F.lit(1)),
            ["doc_a", "doc_b"],
            "full_outer",
        )
        .agg(
            F.count(F.lit(1)).alias("n_either"),
            F.sum(
                (F.col("_a").isNotNull() & F.col("_b").isNotNull()).cast(
                    "long"
                )
            ).alias("n_both"),
        )
        .collect()[0]
    )
    n_both = int(row["n_both"] or 0)
    n_either = int(row["n_either"])
    # round HALF-AWAY-FROM-ZERO like the oracle's SQL round() — Python
    # round() is banker's and would diverge on exact .00005 boundaries
    agreement = (
        math.floor(n_both / n_either * 10_000 + 0.5) / 10_000
        if n_either
        else 0.0
    )
    return spark.createDataFrame(
        [(n_mh, n_sh, n_both, n_either, float(agreement))],
        "n_minhash long, n_simhash long, n_both long, n_either long, "
        "agreement double",
    )
