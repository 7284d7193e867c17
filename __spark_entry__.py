"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(mapreduce_distributed_systems_spark/plans/registry.py). Every
implemented operator from SURVEY.md §2 is a QuerySpec there with a
PySpark callable and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_distributed_systems_spark.plans.registry import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's own flagship app — word count
    with exact mrapps/wc.go tokenization — over sf0.001 documents."""
    from mapreduce_distributed_systems_spark.plans.registry import get_spec

    return get_spec("wc").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
