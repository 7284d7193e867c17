"""Text source/sink parity with the reference engine.

- A1 whole-file scan (mr/worker.go:166-173, one map task per file;
  map receives (filename, full contents)): `read_whole_text_files`
  yields DataFrame(filename string, content string) — the exact input
  contract of the reference's Map functions.
- A7 text sink (mr/worker.go:124-138: per-reduce-partition files of
  '<key> <value>' lines, keys sorted within each file):
  `write_mr_output` — sortWithinPartitions + concat_ws, so each
  output partition is the analogue of one mr-out-R file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_whole_text_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per file: (filename, content) — matches the reference's
    map-input contract. Whole files are indivisible units, so files ARE
    the parallelism unit, exactly like the reference's one-map-task-
    per-file scheduling (mr/coordinator.go:146-156)."""
    rdd = spark.sparkContext.wholeTextFiles(path_glob)
    return spark.createDataFrame(rdd, schema="filename string, content string")


def write_mr_output(
    df: DataFrame,
    path: str,
    n_reduce: int = 10,
    key_col: str = "key",
    value_col: str = "value",
) -> None:
    """Write the reference's output shape: n_reduce hash partitions,
    '<key> <value>' text lines, keys sorted within each partition
    (mr/worker.go:124-138). Spark's commit protocol provides the
    all-or-nothing visibility the early_exit test demands."""
    (
        df.repartition(n_reduce, F.col(key_col))
        .sortWithinPartitions(key_col)
        .select(
            F.concat_ws(" ", F.col(key_col).cast("string"),
                        F.col(value_col).cast("string")).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
