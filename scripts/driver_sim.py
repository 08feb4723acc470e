"""Simulate the grading driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count + column names + an order-insensitive value hash.
Queries without an oracle get a rows-only smoke check.

Usage: python scripts/driver_sim.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
from datetime import datetime

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        if isinstance(v, datetime):
            return v.replace(tzinfo=None).isoformat(sep=" ")
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cv(x) for x in v) + "]"
        if isinstance(v, dict):
            return "{" + ",".join(f"{k}:{cv(x)}" for k, x in sorted(v.items())) + "}"
        return repr(v)

    canon_rows = sorted("|".join(cv(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:12]
    return [cols[i] for i in order], len(rows), h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

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
            scols, sn, sh = canon(sdf.columns, [tuple(r) for r in sdf.collect()])
            if name not in oracles:
                print(f"SMOKE {name}: rows={sn} (no oracle)")
                continue
            r = con.execute(oracles[name])
            dcols, dn, dh = canon([c[0] for c in r.description], r.fetchall())
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
