"""Central query registry.

Every implemented operator from SURVEY.md §2 registers here as a
QuerySpec: a PySpark callable `(spark, sf_dir) -> DataFrame` plus (when
SQL-expressible) the equivalent DuckDB oracle SQL. `__spark_entry__.py`
exposes this registry through the driver contract
(queries() / oracle_sql()), and bench.py runs the `bench=True` subset.

Contract notes (driver compare is order-insensitive but exact):
- every computed column is aliased identically in Spark and SQL;
- floating-point aggregates are rounded in BOTH engines so the
  emitted doubles are bit-identical despite different summation order;
- top-k queries order with a deterministic tiebreak before LIMIT.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# operator modules imported for registration side effects
_OPERATOR_MODULES = (
    "mapreduce_distributed_systems_spark.operators.wordcount",
    "mapreduce_distributed_systems_spark.operators.inverted_index",
    "mapreduce_distributed_systems_spark.operators.mr_apps",
    "mapreduce_distributed_systems_spark.operators.relational",
    "mapreduce_distributed_systems_spark.operators.tpch_more",
    "mapreduce_distributed_systems_spark.operators.functions_ext",
    "mapreduce_distributed_systems_spark.operators.windows",
    "mapreduce_distributed_systems_spark.operators.events",
    "mapreduce_distributed_systems_spark.operators.kv",
    "mapreduce_distributed_systems_spark.operators.shard",
    "mapreduce_distributed_systems_spark.operators.dedup",
    "mapreduce_distributed_systems_spark.operators.simhash64",
    "mapreduce_distributed_systems_spark.operators.similarity",
    "mapreduce_distributed_systems_spark.operators.text_analysis",
    "mapreduce_distributed_systems_spark.operators.multimodal",
    "mapreduce_distributed_systems_spark.operators.pipeline",
    "mapreduce_distributed_systems_spark.operators.sampling",
    "mapreduce_distributed_systems_spark.operators.kmeans",
    "mapreduce_distributed_systems_spark.streaming.kv_stream",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → driver rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), bench=bench,
            doc=doc or (fn.__doc__ or ""),
        )
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def bench_specs() -> dict[str, QuerySpec]:
    return {k: v for k, v in all_specs().items() if v.bench}


def get_spec(name: str) -> QuerySpec:
    _load()
    return _REGISTRY[name]
