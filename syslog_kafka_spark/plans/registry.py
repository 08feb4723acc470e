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


# The driver's correctness gate evaluates the FIRST 50 registry entries in
# iteration order. Round-5 window: the 6 queries without a driver stamp —
# the 3 CORRECTNESS_r04 reds, now fixed (kafka_decode_roundtrip flattens
# its timing arrays to '|'-joined strings per house convention;
# agg_integrity_audit and scalar_collation_caseless CAST their oracle
# integer sums to BIGINT so DuckDB doesn't surface HUGEINT→float64), and
# the 3 r4 additions that never fit a window (reshape_pivot_multi_agg,
# window_cohort_retention, window_nth_value_snapshots) — then the new
# round-5 queries, then backfill drawn from the OLDEST stamps (r1/r2)
# with the family-coverage entries (streaming/scans/setops/sorts/syslog)
# pinned so every family stays inside the gate
# (tests/test_registry_window.py). Everything rotated out keeps its
# r1–r4 stamp and stays covered by tests/test_inventory_oracle.py.
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- never driver-stamped: the 3 fixed r4 reds ---
    "kafka_decode_roundtrip",
    "agg_integrity_audit",
    "scalar_collation_caseless",
    # --- never driver-stamped: newest r4 additions ---
    "reshape_pivot_multi_agg",
    "window_cohort_retention",
    "window_nth_value_snapshots",
    # --- new r5, batch 1 (Spark-4 surfaces: native XML round trip, SQL
    # UDFs, SQL scripting, GROUP BY ALL, DataFrame lateralJoin,
    # Trigger.AvailableNow drain) ---
    "scan_xml_roundtrip",
    "scalar_sql_udf",
    "scalar_sql_scripting",
    "agg_group_by_all",
    "join_lateral_dataframe_api",
    "stream_available_now_trigger",
    # --- new r5, batch 2 (training-data pipeline: temperature-scaled
    # domain mixture, winnowing fingerprints, DSIR importance weights,
    # URL canonicalization dedup) ---
    "llm_domain_mixture",
    "llm_winnowing_fingerprints",
    "llm_dsir_importance",
    "llm_url_canonical_dedup",
    # --- new r5, batch 3 (calendar-interval semantics, count_if +
    # argmax aggregates, tokenizer fertility, embedding-centroid audit) ---
    "scalar_interval_arithmetic",
    "agg_count_if_extrema_by",
    "llm_tokenizer_fertility",
    "llm_embedding_centroid_audit",
    # --- new r5, batch 4 (observe() DQ metrics, mapInArrow kernel stage,
    # stream-static anti-join catalog dedup) ---
    "scan_observe_metrics",
    "llm_arrow_native_lengths",
    "stream_static_anti_dedup",
    "llm_media_frame_sample",
    "kafka_partitioner_histogram",
    "scan_agg_pushdown",
    "llm_gopher_rules",
    "join_scd2_point_in_time",
    "llm_leakage_safe_split",
    "stream_stream_left_outer_join",
    "sort_global_range_partitioned",
    # --- family coverage (oldest stamp per uncovered family) ---
    "stream_tumbling_window_agg",
    "scan_csv_typed",
    "setop_union_distinct",
    "sort_mixed_direction",
    "syslog_severity_histogram",
    # --- backfill: oldest stamps (r1/r2), re-freshened this round ---
    "llm_chunk_dedup",
    "agg_conditional",
    "agg_cube_orders",
    "agg_exact_percentiles",
    "agg_grouping_sets",
    "agg_having_big_customers",
    "agg_min_max_extremes",
    "agg_multi_distinct",
    "agg_revenue_forecast",
    "agg_rollup_revenue",
    "agg_stats_moments",
    "join_anti_silent_customers",
    "join_asof_last_error",
    "join_broadcast_brand_volume",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module so its @query decorators run.

    Returns the inventory ordered by ``WINDOW_PRIORITY`` first (the driver
    correctness gate reads the first 50 entries), then every remaining
    query in registration order.
    """
    # Imports are side-effecting registrations; keep them here so callers
    # get the complete inventory with one call.
    from syslog_kafka_spark.plans import (  # noqa: F401
        aggregates,
        extras,
        joins,
        kafka_roundtrip,
        llm,
        mining,
        reshape,
        scalars,
        scans,
        setops,
        sorts,
        stream_gated,
        syslog_queries,
        tpch_like,
        windows,
    )

    missing = [n for n in WINDOW_PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(f"WINDOW_PRIORITY names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in WINDOW_PRIORITY}
    ordered.update({n: s for n, s in QUERIES.items() if n not in ordered})
    return ordered
