"""Gated syslog queries (SURVEY §2B.1): RFC 3164/5424 parsing + derived
log analytics, self-contained over the inline fixture corpus so the
DuckDB oracle needs no extra table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from syslog_kafka_spark.plans.registry import query
from syslog_kafka_spark.sources.syslog_fixtures import SYSLOG_CORPUS, corpus_values_sql
from syslog_kafka_spark.sources.syslog_parse import oracle_sql_for_lines, parse_syslog_lines


def _corpus_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(line,) for line in SYSLOG_CORPUS], ["line"])


@query(
    "syslog_parse_corpus",
    family="syslog",
    oracle=f"""
        SELECT * FROM ({oracle_sql_for_lines(corpus_values_sql())})
        ORDER BY raw
    """,
)
def syslog_parse_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full RFC 3164/5424 parse of the fixture corpus: pri/facility/
    severity decode, header field extraction, nil handling, unparseable
    lines preserved with pri NULL."""
    return parse_syslog_lines(_corpus_df(spark)).orderBy("raw")


@query(
    "syslog_severity_histogram",
    family="syslog",
    oracle=f"""
        WITH parsed AS ({oracle_sql_for_lines(corpus_values_sql())})
        SELECT facility, severity, count(*) AS n,
               count(DISTINCT host) AS n_hosts
        FROM parsed
        WHERE pri IS NOT NULL
        GROUP BY facility, severity
        ORDER BY facility, severity
    """,
)
def syslog_severity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-analytics twin: facility/severity histogram over parsed lines —
    the canonical first query on an ingested syslog stream."""
    parsed = parse_syslog_lines(_corpus_df(spark))
    return (
        parsed.filter(F.col("pri").isNotNull())
        .groupBy("facility", "severity")
        .agg(F.count("*").alias("n"), F.countDistinct("host").alias("n_hosts"))
        .orderBy("facility", "severity")
    )


# RFC 5424 §6.2.1 keyword tables — frozen constants shared verbatim by
# both engines (the gate guarantees they never drift apart).
SEVERITY_NAMES = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]
FACILITY_NAMES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "console", "cron2",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6",
    "local7",
]


def _name_case(expr: str, names: list[str]) -> str:
    whens = " ".join(f"WHEN {i} THEN '{n}'" for i, n in enumerate(names))
    return f"CASE {expr} {whens} END"


@query(
    "syslog_named_levels",
    family="syslog",
    oracle=f"""
        WITH parsed AS ({oracle_sql_for_lines(corpus_values_sql())})
        SELECT {_name_case('facility', FACILITY_NAMES)} AS facility_name,
               {_name_case('severity', SEVERITY_NAMES)} AS severity_name,
               count(*) AS n
        FROM parsed
        WHERE pri IS NOT NULL
        GROUP BY facility_name, severity_name
        ORDER BY facility_name, severity_name
    """,
)
def syslog_named_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 5424 keyword decode: numeric facility/severity mapped to their
    standard names (kern/user/daemon..., emerg...debug) — what a log UI
    displays. Pure CASE decode on already-parsed integers; the keyword
    tables are module constants shared character-for-character with the
    oracle."""
    parsed = parse_syslog_lines(_corpus_df(spark))

    def name_col(col: str, names: list[str]):
        expr = None
        for i, n in enumerate(names):
            expr = (
                F.when(F.col(col) == i, F.lit(n))
                if expr is None
                else expr.when(F.col(col) == i, F.lit(n))
            )
        return expr

    return (
        parsed.filter(F.col("pri").isNotNull())
        .select(
            name_col("facility", FACILITY_NAMES).alias("facility_name"),
            name_col("severity", SEVERITY_NAMES).alias("severity_name"),
        )
        .groupBy("facility_name", "severity_name")
        .agg(F.count("*").alias("n"))
        .orderBy("facility_name", "severity_name")
    )
