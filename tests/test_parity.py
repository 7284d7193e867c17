"""Golden-output differential testing, the reference's core strategy
(main/test-mr.sh:81-111 compares distributed vs sequential output):
every registered query runs on Spark AND on the DuckDB oracle and must
match order-insensitively — same gate the driver applies at sf0.01."""

from __future__ import annotations

import pytest

from mapreduce_distributed_systems_spark.plans.registry import all_specs
from tests.duck_oracle import compare_spark_vs_oracle

SPECS = all_specs()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    compare_spark_vs_oracle(df, spec.oracle, sf_dir)


def test_no_rows_only_queries_remain():
    """Round 5 retired the rows-only list (kmeans_cells was the last):
    every registered query must carry a hash-certifying oracle. A name
    appearing here means a new query shipped without one — either
    write the oracle or document the exception in COVERAGE.md."""
    assert ROWS_ONLY == [], f"queries without oracles: {ROWS_ONLY}"
