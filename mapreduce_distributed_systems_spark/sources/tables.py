"""Parquet table sources for the driver's star schema (TESTDATA.md).

The reference's only source is whole-file text scan
(mr/worker.go:166-173, one map task per file); our sources are
columnar parquet scans so Catalyst gets predicate pushdown + column
pruning + partition pruning for free. `documents` stands in for the
reference's Gutenberg text corpus (FIXTURES.md §1): doc_id ≙ filename,
text ≙ whole file contents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough (even at 100 TB scale factors) to broadcast:
# region is 5 rows always; nation 25. customer/supplier/part grow with
# SF — never hard-broadcast those, let AQE decide from runtime stats.
ALWAYS_BROADCAST = ("region", "nation")


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (LTZ), whatever
    physical representation the parquet presented it as. The driver
    data has shipped `ts` three ways so far:

    - TIMESTAMP(NANOS): Spark surfaces it as int64 ns under
      spark.sql.legacy.parquet.nanosAsLong → truncate to µs (the same
      ns→µs truncation DuckDB applies) and convert.
    - TIMESTAMP_NTZ (naive µs): value-preserving cast to TIMESTAMP —
      the session TZ is pinned to UTC (session.py), so the LTZ value
      equals the naive value the DuckDB oracle sees.
    - TIMESTAMP: already the form watermarks/unix_micros need.

    Streaming watermarks (`withWatermark`) and `unix_micros` both
    reject TIMESTAMP_NTZ, so every ts consumer goes through here.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    from mapreduce_distributed_systems_spark.session import ensure_session_compat

    ensure_session_compat(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_ts(df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load all tables; optionally register them as temp views so
    operators written in SQL see the same names the DuckDB oracle does."""
    dfs = {name: load_table(spark, sf_dir, name) for name in TABLES}
    if register_views:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
    return dfs
