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
from mapreduce_distributed_systems_spark.scratch import (  # noqa: E402
    ensure_process_scratch,
)

# The external driver brings its own SparkSession (get_spark never
# runs), so the process-scoped scratch root is claimed at import time:
# every temp dir the streaming/snapshot/index queries allocate dies
# with the driver process instead of stranding in /tmp (ADVICE r7,
# generalized round 8 — see mapreduce_distributed_systems_spark/scratch.py).
ensure_process_scratch()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's own flagship app — word count
    with exact mrapps/wc.go tokenization — over sf0.001 documents."""
    from mapreduce_distributed_systems_spark.plans.registry import get_spec

    return get_spec("wc").fn(spark, "/root/testdata/sf0.001")


def _isolated(fn: Callable[[SparkSession, str], DataFrame]):
    """Evict any cached blocks left by the PREVIOUS query before
    building this one's plan. Some queries cache bounded intermediates
    (signature tables, IVF assignments) that live until materialization
    and so cannot unpersist inside their own function; in the driver's
    130-query back-to-back session those blocks would otherwise
    accumulate and pressure executor memory (ADVICE r4). Clearing at
    query entry keeps every query self-contained without touching the
    caches it is about to build."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _isolated(spec.fn) for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
