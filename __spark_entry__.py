"""Driver contract for the spark-graft builder (PySpark target).

Everything here derives from the engine's query inventory
(``syslog_kafka_spark.plans.registry``): ``queries()`` exposes one callable
per implemented operator from SURVEY.md §2, ``oracle_sql()`` the matching
DuckDB SQL for hash-compared correctness, and ``entry()`` runs the flagship
query as a smoke check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from syslog_kafka_spark.plans.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "agg_pricing_summary"


def _utc(build: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Pin the session timezone to UTC before building.

    The driver supplies its own SparkSession; timestamp collection and
    string→timestamp casts are session-tz-dependent, and every oracle
    compares against DuckDB's tz-naive UTC values.
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # Spark 4.1 reads tz-naive parquet timestamps as TIMESTAMP_NTZ, which
        # unix_micros()/withWatermark() reject; read as TIMESTAMP instead
        # (values unchanged under the pinned-UTC session tz). The loaders also
        # cast any NTZ column defensively — this conf covers the driver's own
        # scans too.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        return build(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = load_all()
    return _utc(specs[FLAGSHIP].build)(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _utc(spec.build) for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
