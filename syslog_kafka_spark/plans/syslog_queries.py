"""Gated syslog queries (SURVEY §2B.1): RFC 3164/5424 parsing + derived
log analytics, self-contained over the inline fixture corpus so the
DuckDB oracle needs no extra table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from syslog_kafka_spark.plans.registry import query
from syslog_kafka_spark.sources.syslog_fixtures import SYSLOG_CORPUS, corpus_values_sql
from syslog_kafka_spark.sources.syslog_parse import (
    RFC5424_RE,
    SD_ELEMENT_RE,
    SD_ID_RE,
    SD_PARAM_RE,
    oracle_sql_for_lines,
    parse_syslog_lines,
    with_structured_data,
)


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


def _sd_params_oracle() -> str:
    """DuckDB twin of the structured-data decode: same element/param
    regexes (module constants, shared verbatim), unnest in place of the
    nested transform, split_part for substring_index."""
    r5424 = RFC5424_RE.replace("'", "''")
    return f"""
        WITH raw AS (SELECT line FROM {corpus_values_sql()}),
        m AS (
          SELECT line,
                 regexp_extract(line, '{r5424}', 4) AS host,
                 regexp_extract(line, '{r5424}', 5) AS app,
                 nullif(nullif(regexp_extract(line, '{r5424}', 8), ''), '-') AS sdr
          FROM raw
          WHERE regexp_matches(line, '^<[0-9]{{1,3}}>[0-9]{{1,2}} ')
            AND TRY_CAST(regexp_extract(line, '{r5424}', 1) AS INT) <= 191
        ),
        elems AS (
          SELECT line, host, app,
                 unnest(regexp_extract_all(sdr, '{SD_ELEMENT_RE}', 1)) AS e
          FROM m WHERE sdr IS NOT NULL
        ),
        params AS (
          SELECT line, host, app, regexp_extract(e, '{SD_ID_RE}', 1) AS sd_id,
                 unnest(regexp_extract_all(e, '{SD_PARAM_RE}', 0)) AS p
          FROM elems
        ),
        kv AS (
          SELECT line, host, app,
                 sd_id || '/' || split_part(p, '=', 1) AS sd_key,
                 regexp_extract(p, '"(.*)"', 1) AS sd_value
          FROM params
        )
        SELECT host, app,
               CAST(count(*) OVER (PARTITION BY line) AS INT) AS n_params,
               sd_key, sd_value
        FROM kv
        ORDER BY host, sd_key
    """


@query("syslog_sd_params", family="syslog", oracle=_sd_params_oracle())
def syslog_sd_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 5424 §6.3 structured-data decode: `[sd-id k="v" ...]*` parsed
    into a map<string,string> with flattened `sd-id/param` keys — the
    deepening of the reference's LogLine `tag` map model
    (/root/reference avro/logline.avsc:16-54) the reference never did.
    The gate drives the FULL map path (regexp_extract_all → nested
    transform → map_from_entries), then explodes the map back to rows so
    every decoded key/value lands in the hash. Lines without structured
    data (RFC 3164, nil SD, unparseable) decode to null and drop out."""
    parsed = with_structured_data(_corpus_df(spark))
    return (
        parsed.filter(F.col("sd").isNotNull() & (F.size(F.map_entries(F.col("sd"))) > 0))
        .select(
            F.regexp_extract(F.col("line"), RFC5424_RE, 4).alias("host"),
            F.regexp_extract(F.col("line"), RFC5424_RE, 5).alias("app"),
            F.size(F.map_entries(F.col("sd"))).alias("n_params"),
            F.explode(F.col("sd")).alias("sd_key", "sd_value"),
        )
        .orderBy("host", "sd_key")
    )
