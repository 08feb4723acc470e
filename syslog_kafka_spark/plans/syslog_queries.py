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
