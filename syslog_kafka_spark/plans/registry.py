"""Query inventory registry.

Every gated capability of the engine is declared here as a named
``QuerySpec``: a Spark-first builder (DataFrame API — Catalyst owns the
physical plan) plus, when SQL-expressible, a DuckDB oracle string over the
same parquet tables. The driver's correctness gate runs both sides and
hash-compares results, so builders must be deterministic: every aggregate
aliased identically on both sides, floats rounded, ties broken by unique
keys.

The registry is the single source of truth for ``__spark_entry__.queries()``
/ ``oracle_sql()``, for the pytest oracle suite, and for ``bench.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    family: str
    build: Builder
    oracle: str | None = None
    doc: str = ""
    bench: bool = True  # include in bench.py's headline timing run


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    family: str,
    oracle: str | None = None,
    bench: bool = True,
) -> Callable[[Builder], Builder]:
    """Register a query builder under ``name``.

    ``oracle`` is ANSI/DuckDB SQL equivalent to the Spark plan; ``None``
    marks a non-SQL-expressible op (driver falls back to rows-only check).
    """

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name,
            family=family,
            build=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module so its @query decorators run."""
    # Imports are side-effecting registrations; keep them here so callers
    # get the complete inventory with one call.
    from syslog_kafka_spark.plans import (  # noqa: F401
        aggregates,
        extras,
        joins,
        llm,
        reshape,
        scalars,
        setops,
        sorts,
        syslog_queries,
        tpch_like,
        windows,
    )

    return QUERIES
