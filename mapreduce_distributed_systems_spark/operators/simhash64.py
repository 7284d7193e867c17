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
so both engines derive identical signatures.

Scale design (100 TB): the doc -> signature stage is a narrow
tokenize + one groupBy(doc_id) aggregation; what shuffles afterwards
is only (doc_id, two ints) exploded into 4 band rows. The candidate
join is an equi-join on (band, 16-bit key) — the classic
Charikar-style near-dup pipeline (Manku et al., WWW'07), never a
cross join. With 4 bands of 16 bits a corpus of N docs spreads over
~65k buckets per band; skewed buckets (boilerplate docs) are bounded
by the band key's 16-bit cardinality and AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.functions.text import words
from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

HAMMING_MAX64 = 6  # of 64 bits (Manku et al. use 3 of 64 at web scale)

# value of hex digit i (1-based position p) in md5 string h
def _hexval_spark(h: str, start: int, n: int) -> str:
    """SQL expr: integer value of n hex chars of `h` from 1-based
    `start` (n <= 8 so the result fits comfortably in a BIGINT)."""
    terms = [
        f"cast(instr('0123456789abcdef', substring({h}, {start + i}, 1)) - 1 "
        f"as bigint) * {16 ** (n - 1 - i)}L"
        for i in range(n)
    ]
    return " + ".join(terms)


def _hexval_duck(h: str, start: int, n: int) -> str:
    terms = [
        f"(strpos('0123456789abcdef', substring({h}, {start + i}, 1)) - 1) "
        f"* {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return " + ".join(terms)


def simhash64_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sim_hi, sim_lo): weighted 64-bit SimHash, halves as
    32-bit values. One md5 per distinct (doc, token); the 64 bit
    contributions explode from a half+bit grid (2 x 32 rows) and
    aggregate back per doc — all built-in expressions, no UDFs."""
    tok_w = (
        docs.select("doc_id", F.explode(words("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("w"))
        .withColumn("h", F.md5("tok"))
        # hi = first 8 hex chars, lo = next 8 (32 bits each)
        .withColumn("val_hi", F.expr(_hexval_spark("h", 1, 8)))
        .withColumn("val_lo", F.expr(_hexval_spark("h", 9, 8)))
    )
    bits = tok_w.select(
        "doc_id",
        "w",
        F.explode(
            F.expr(
                "flatten(transform(array(val_hi, val_lo), (v, half) -> "
                "transform(sequence(0, 31), b -> "
                "struct(half as half, b as bit, "
                "(v div shiftleft(1L, b)) % 2 as bit_on))))"
            )
        ).alias("hb"),
    ).select("doc_id", "w", "hb.half", "hb.bit", "hb.bit_on")
    contrib = bits.groupBy("doc_id", "half", "bit").agg(
        F.sum(
            F.when(F.col("bit_on") == 1, F.col("w")).otherwise(-F.col("w"))
        ).alias("c")
    )
    return (
        contrib.groupBy("doc_id", "half")
        .agg(
            F.sum(
                F.when(F.col("c") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0))
            ).alias("s")
        )
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("half") == 0, F.col("s"))).alias("sim_hi"),
            F.max(F.when(F.col("half") == 1, F.col("s"))).alias("sim_lo"),
        )
    )


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
         {_hexval_duck('h', 1, 8)} AS val_hi,
         {_hexval_duck('h', 9, 8)} AS val_lo
  FROM tok_w
),
bits AS (
  SELECT doc_id, w, half, bit,
         ((CASE half WHEN 0 THEN val_hi ELSE val_lo END)
           // (1::BIGINT << bit)) % 2 AS on_bit
  FROM vals,
       (SELECT unnest([0, 1]) AS half),
       (SELECT unnest(range(0, 32)) AS bit)
),
contrib AS (
  SELECT doc_id, half, bit,
         sum(CASE WHEN on_bit = 1 THEN w ELSE -w END) AS c
  FROM bits GROUP BY doc_id, half, bit
),
halves AS (
  SELECT doc_id, half,
         sum(CASE WHEN c > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS s
  FROM contrib GROUP BY doc_id, half
),
sig AS (
  SELECT doc_id,
         max(CASE WHEN half = 0 THEN s END) AS sim_hi,
         max(CASE WHEN half = 1 THEN s END) AS sim_lo
  FROM halves GROUP BY doc_id
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
    doc="Production-width 64-bit SimHash near-dup: weighted signature "
    "as two portable 32-bit halves, 4x16-bit band bucket join, "
    "decomposed hamming filter (Manku et al. WWW'07 shape).",
)
def dedup_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = simhash64_signatures(load_table(spark, sf_dir, "documents"))
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
