"""Gated CSV / JSON scans (SURVEY §2B.1, upgraded from smoke to t2).

The reference ingests newline-framed text from sockets (`syslog.go`);
its analytics consumers read whatever lands in object storage. These
queries prove the schema-on-read paths — RFC4180 CSV (quoted commas,
embedded quotes, nulls) and JSON lines (nested structs, arrays) — with a
DuckDB oracle reading the *same fixture file*, so type coercion, quote
handling, and null semantics are hash-compared cross-engine, not just
smoke-tested.

The fixtures live in the repo (`fixtures/`), deterministic by
construction; paths are resolved absolutely so Spark executors and the
oracle's DuckDB process agree regardless of cwd.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from syslog_kafka_spark.plans.registry import query

_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
)
CSV_PATH = os.path.join(_FIXTURE_DIR, "scan_demo.csv")
JSONL_PATH = os.path.join(_FIXTURE_DIR, "scan_demo.jsonl")

CSV_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("category", T.StringType()),
        T.StructField("descr", T.StringType()),
        T.StructField("qty", T.LongType()),
        T.StructField("unit_price", T.DoubleType()),
        T.StructField("ship_date", T.DateType()),
        T.StructField("express", T.BooleanType()),
    ]
)


@query(
    "scan_csv_typed",
    family="scans",
    oracle=f"""
        SELECT category,
               count(*) AS n_lines,
               CAST(count(descr) AS BIGINT) AS n_described,
               CAST(sum(qty) AS BIGINT) AS total_qty,
               CAST(round(sum(qty * unit_price), 2) AS DOUBLE) AS revenue,
               CAST(sum(CASE WHEN express THEN 1 ELSE 0 END) AS BIGINT) AS n_express,
               min(ship_date) AS first_ship,
               max(ship_date) AS last_ship
        FROM read_csv('{CSV_PATH}', header = true, columns = {{
          'order_id': 'BIGINT', 'category': 'VARCHAR', 'descr': 'VARCHAR',
          'qty': 'BIGINT', 'unit_price': 'DOUBLE', 'ship_date': 'DATE',
          'express': 'BOOLEAN'
        }})
        GROUP BY category
        ORDER BY category
    """,
)
def scan_csv_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed CSV scan over the RFC4180 fixture (quoted commas, embedded
    ""-escaped quotes, empty-string nulls), aggregated per category so
    the hash covers every parsed cell. Schema is explicit — schema-on-read
    with inference is nondeterministic under partial scans at scale."""
    df = spark.read.csv(CSV_PATH, header=True, schema=CSV_SCHEMA, escape='"')
    return (
        df.groupBy("category")
        .agg(
            F.count("*").alias("n_lines"),
            F.count("descr").alias("n_described"),
            F.sum("qty").alias("total_qty"),
            F.round(F.sum(F.col("qty") * F.col("unit_price")), 2).alias("revenue"),
            F.sum(F.when(F.col("express"), 1).otherwise(0)).alias("n_express"),
            F.min("ship_date").alias("first_ship"),
            F.max("ship_date").alias("last_ship"),
        )
        .orderBy("category")
    )


JSONL_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField(
            "user",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("plan", T.StringType()),
                ]
            ),
        ),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("dur_ms", T.LongType()),
    ]
)


@query(
    "scan_json_lines",
    family="scans",
    oracle=f"""
        WITH j AS (
          SELECT * FROM read_json('{JSONL_PATH}', format = 'newline_delimited',
            columns = {{
              'event_id': 'BIGINT', 'kind': 'VARCHAR',
              'user': 'STRUCT(id BIGINT, plan VARCHAR)',
              'tags': 'VARCHAR[]', 'dur_ms': 'BIGINT'
            }})
        )
        SELECT j.user.plan AS plan, kind,
               count(*) AS n_events,
               count(DISTINCT j.user.id) AS n_users,
               CAST(sum(dur_ms) AS BIGINT) AS total_ms,
               CAST(sum(len(tags)) AS BIGINT) AS n_tags,
               CAST(sum(CASE WHEN list_contains(tags, 'checkout') THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_checkout
        FROM j
        GROUP BY plan, kind
        ORDER BY plan, kind
    """,
)
def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with nested struct + array columns: dotted struct
    access, array length/containment, aggregated per (plan, kind). The
    explicit schema keeps the scan single-pass (inference reads the file
    twice) and prunes to the referenced fields at 100 TB."""
    df = spark.read.json(JSONL_PATH, schema=JSONL_SCHEMA)
    return (
        df.select(
            F.col("user.plan").alias("plan"),
            "kind",
            F.col("user.id").alias("uid"),
            "tags",
            "dur_ms",
        )
        .groupBy("plan", "kind")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("uid").alias("n_users"),
            F.sum("dur_ms").alias("total_ms"),
            F.sum(F.size("tags")).alias("n_tags"),
            F.sum(
                F.when(F.array_contains("tags", "checkout"), 1).otherwise(0)
            ).alias("n_checkout"),
        )
        .orderBy("plan", "kind")
    )
