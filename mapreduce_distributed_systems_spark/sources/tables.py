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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    from mapreduce_distributed_systems_spark.session import ensure_session_compat

    ensure_session_compat(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts stored as TIMESTAMP(NANOS): read as int64 ns under
        # spark.sql.legacy.parquet.nanosAsLong, truncate to µs — the
        # same ns→µs truncation DuckDB applies when it reads the file.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
