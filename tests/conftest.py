"""Shared fixtures: one SparkSession per test run + the DuckDB oracle.

The oracle helper mirrors the driver's t2 gate: run the Spark plan and the
DuckDB SQL over the same parquet tables, canonicalize (column order by
name, row order by all columns), and compare values exactly.
"""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb
import pytest

from syslog_kafka_spark.model import TABLE_NAMES
from syslog_kafka_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("syslog-kafka-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _canon_value(v):
    """Normalize a single cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def canonicalize(columns, rows):
    """Sort columns by name, canonicalize cells, sort rows — mirrors the
    driver's order-insensitive value-hash."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    canon = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    canon.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, canon


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str, *, name: str = "query"):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d = duck_con.execute(oracle_sql)
    d_cols = [c[0] for c in d.description]
    d_rows = [tuple(r) for r in d.fetchall()]

    sc, sr = canonicalize(s_cols, s_rows)
    dc, dr = canonicalize(d_cols, d_rows)

    assert sc == dc, f"{name}: column mismatch spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"{name}: row count spark={len(sr)} duckdb={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert a == b, f"{name}: row {i} differs\n  spark : {a}\n  duckdb: {b}"
