"""Extended scalar-function library (SURVEY.md §2.D: the reference has
no function library at all — apps call Go stdlib directly; a complete
engine needs the standard string/date surface).

Cross-engine semantic pins worth noting:
- dayofweek: Spark is 1=Sunday..7; DuckDB dow is 0=Sunday..6 — the
  oracle adds 1 explicitly;
- levenshtein returns int32 in Spark, BIGINT in DuckDB — cast;
- split_part / regexp_extract exist under the same names in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_distributed_systems_spark.plans.registry import register
from mapreduce_distributed_systems_spark.sources import load_table

STRING_EXT_ORACLE = """
SELECT c_custkey,
       split_part(c_name, '#', 2) AS cust_num,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       rpad(c_mktsegment, 12, '.') AS seg_padded,
       reverse(c_mktsegment) AS seg_rev,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel,
       repeat('*', CAST(c_custkey % 4 AS INTEGER)) AS stars,
       CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS seg_dist,
       CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
       trim('C' FROM c_mktsegment) AS seg_trimmed
FROM customer
"""


@register(
    "string_funcs_ext",
    oracle=STRING_EXT_ORACLE,
    tags=("relational", "scalar", "string"),
    doc="Extended string library: split_part, regexp_extract, pads, "
    "reverse, translate, repeat, levenshtein, strpos, char-trim.",
)
def string_funcs_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("split_part(c_name, '#', 2)").alias("cust_num"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_padded"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lowvowel"),
        F.expr("repeat('*', cast(c_custkey % 4 as int))").alias("stars"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).cast("long").alias(
            "seg_dist"
        ),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.expr("trim(BOTH 'C' FROM c_mktsegment)").alias("seg_trimmed"),
    )


DATE_EXT_ORACLE = """
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       last_day(o_orderdate::DATE) AS month_end,
       (o_orderdate::DATE + INTERVAL 3 MONTH)::DATE AS plus3m,
       date_trunc('quarter', o_orderdate)::TIMESTAMP AS quarter_start
FROM orders
"""


@register(
    "date_funcs_ext",
    oracle=DATE_EXT_ORACLE,
    tags=("relational", "scalar", "date"),
    doc="Extended date library: quarter, day-of-week (convention pinned "
    "to Spark's 1=Sunday), day/week-of-year, last_day, add_months, "
    "quarter truncation.",
)
def date_funcs_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("plus3m"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
    )
