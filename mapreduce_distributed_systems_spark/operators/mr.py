"""Thin RDD-based `map_reduce` compatibility facade.

Mirrors the reference's user API — `Map(filename, contents)
-> []KeyValue`, `Reduce(key, []values) -> string`
(mr/worker.go:29-30, main/mrsequential.go:91-108) — for apps that
aren't SQL-expressible. Everything the reference's engine does by hand
(hash partition on the key, shuffle, group, per-key reduce,
mr/worker.go:102-139,166-192) is Spark's `flatMap → groupByKey →
mapValues` here; the two-phase barrier is the shuffle stage boundary.

This is deliberately the ONLY RDD surface in the engine — the
DataFrame formulations (wordcount.py, inverted_index.py, mr_apps.py)
are the optimized path (Catalyst partial aggregation, codegen); this
facade exists for API parity and is validated against them in tests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

MapFn = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], str]


def map_reduce(
    spark: SparkSession,
    inputs: DataFrame,
    mapf: MapFn,
    reducef: ReduceFn,
    n_reduce: int = 10,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Run a reference-style (Map, Reduce) pair over a 2-column
    DataFrame of (input-key, input-contents) strings.

    Returns a DataFrame(key string, value string), the analogue of the
    mr-out-* files (sorted-by-key formatting is left to the sink, as
    in mr/worker.go:124-138).
    """
    rdd = inputs.select(key_col, value_col).rdd.map(lambda r: (r[0], r[1]))
    pairs = rdd.flatMap(lambda kv: mapf(str(kv[0]), str(kv[1])))
    # groupByKey == the reference's hash-partition + shuffle-read group
    # (mr/worker.go:175-190, 102-122). Value arrival order within a key
    # is nondeterministic in the reference too (map-task completion
    # order) — reducers must not depend on it, same contract.
    reduced = (
        pairs.groupByKey(numPartitions=n_reduce)
        .map(lambda kv: (kv[0], reducef(kv[0], list(kv[1]))))
    )
    return spark.createDataFrame(reduced, schema="key string, value string")
