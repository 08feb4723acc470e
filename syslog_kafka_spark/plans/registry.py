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
# iteration order. This explicit ordering guarantees every SURVEY §2B family
# gets oracle-gated rows inside that window: all previously-unchecked
# families (windows, sorts, setops, syslog, scalars, TPC-H composites) lead,
# followed by one representative per already-proven family. Queries past the
# window remain covered by the pytest oracle suite (tests/test_inventory_oracle.py).
WINDOW_PRIORITY: tuple[str, ...] = (
    # flagship
    "agg_pricing_summary",
    # windows (2B.5) — none driver-checked in r01
    "window_tumbling_batch_twin",
    "window_top3_orders_per_cust",
    "window_running_spend",
    "window_rank_family",
    "window_lag_lead_gaps",
    "window_range_frame_hourly",
    "window_first_last_value",
    "window_sessionize_30min",
    # sorts (2B.6)
    "sort_top_orders",
    "sort_nulls_ordering",
    "sort_mixed_direction",
    # set operations (2B.7)
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except",
    # syslog batch parse (2B.1)
    "syslog_parse_corpus",
    "syslog_severity_histogram",
    # scalar/function coverage (2B.2, 2B.8)
    "scalar_value_bucketing",
    "scalar_string_funcs",
    "scalar_regex_like",
    "scalar_datetime_funcs",
    "scalar_math_funcs",
    "scalar_array_funcs",
    "scalar_explode_tokens",
    "scalar_json_funcs",
    "scalar_map_funcs",
    "scalar_casts_conditionals",
    "scalar_array_advanced",
    # canonicalizer-fixed aggregates
    "agg_collect_sorted",
    "approx_percentiles",
    # joins not yet driver-checked
    "join_not_in_subquery",
    # TPC-H composites (join reordering / decorrelation shapes) — the
    # distinctive plan shapes stay gated here; the simpler revenue/agg
    # composites rotate out in favor of the curation-tier flagships below
    "tpch_above_nation_average",
    "tpch_nation_volume_flow",
    "tpch_scalar_subquery_filter",
    "tpch_min_cost_supplier",
    "tpch_profit_by_nation",
    "tpch_order_count_distribution",
    "tpch_waiting_suppliers",
    # curation-tier flagships (round-2 additions)
    "llm_quality_repetition",
    "llm_chunk_dedup",
    "llm_unigram_logprob",
    "llm_media_features",
    # re-blocked / newly hash-gated this round — keep them in the window
    "llm_jaccard_neardup",
    "llm_minhash_estimate",
    "llm_minhash_lsh_pairs",
    "llm_simhash_neardup",
    # new hash-gated curation ops this round — rotate in over two
    # already-proven r01 representatives (their families stay covered:
    # joins via join_not_in_subquery and the tpch_* shapes, llm via the
    # curation/dedup flagships above)
    "llm_decontamination",
    "llm_pack_assignment",
    # streaming family representative — the REAL streaming execution path
    # (readStream -> watermark -> windowed agg -> memory sink), hash-gated
    # against the same oracle as its batch twin
    "stream_tumbling_window_agg",
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
        llm,
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
