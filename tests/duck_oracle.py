"""DuckDB oracle runner + order-insensitive comparison, mirroring the
driver's t2 gate (row-count + schema-name + value compare with columns
sorted by name, rows sorted)."""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import duckdb

from mapreduce_distributed_systems_spark.sources.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact compare on the emitted double — queries are expected to
        # round in-query; this catches when they forgot
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def compare_spark_vs_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert the Spark result matches the DuckDB oracle (column names
    sorted, rows order-insensitive, values exact after normalization)."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duck_connect(sf_dir)
    try:
        cur = con.execute(oracle_sql)
        d_cols = [c[0] for c in cur.description]
        d_rows = cur.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column-name mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = normalize(s_cols, s_rows)
    dn = normalize(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        assert a == b, f"value mismatch at sorted-row {i}:\n  spark={a}\n  duck ={b}"
