"""Registry-wide oracle output contract (round-5, from the r4 verdict).

The driver canonicalizes BOTH engines through pandas. Two DuckDB-side
type classes silently break that path even when values are right:

- HUGEINT (what bare ``sum()`` over integers returns) -> pandas float64,
  which renders "302.0" where Spark's BIGINT renders "302" -> hash FAIL;
- nested types (LIST/STRUCT/MAP) -> python objects that make pandas
  ``sort_values`` raise TypeError -> driver ERR.

So the house rule is: every oracle's FINAL projection casts integer
aggregates to BIGINT and flattens collections to strings. This test
enforces the rule statically over the whole inventory with
``DESCRIBE <oracle>`` — no query execution, so it stays O(ms) per oracle
and runs on every pytest invocation.
"""

from __future__ import annotations

import duckdb
import pytest

from syslog_kafka_spark.model import TABLE_NAMES
from syslog_kafka_spark.plans.registry import load_all

ALL = load_all()
ORACLED = sorted(n for n, s in ALL.items() if s.oracle is not None)

_BANNED_EXACT = {"HUGEINT", "UHUGEINT"}
_BANNED_PREFIX = ("STRUCT(", "MAP(", "UNION(")


@pytest.fixture(scope="module")
def describe_con(sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED, ids=ORACLED)
def test_oracle_projects_driver_safe_types(name, describe_con):
    rows = describe_con.execute(f"DESCRIBE {ALL[name].oracle}").fetchall()
    bad = []
    for col_name, col_type, *_ in rows:
        t = col_type.upper()
        if t in _BANNED_EXACT or t.endswith("[]") or t.startswith(_BANNED_PREFIX):
            bad.append(f"{col_name}: {col_type}")
    assert not bad, (
        f"{name}: oracle final projection has driver-unsafe column types "
        f"{bad} — CAST integer aggregates AS BIGINT and flatten "
        f"collections to strings (see scripts/driver_sim.py docstring)"
    )
