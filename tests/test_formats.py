"""Format round-trips: parquet/csv/json write -> read preserves rows
and schema exactly (timestamps included)."""

from __future__ import annotations

import tempfile

import pytest

from mapreduce_distributed_systems_spark.sources import load_table
from mapreduce_distributed_systems_spark.sources.formats import (
    read_table_as,
    write_table,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip_orders(spark, sf_dir, fmt):
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix=f"fmt_{fmt}_") + "/orders"
    write_table(orders, path, fmt)
    back = read_table_as(spark, path, orders.schema, fmt)
    assert back.schema == orders.schema
    assert _rows(back) == _rows(orders)
