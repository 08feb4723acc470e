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
    # Required on every oracle=None query: the hash-gated counterpart that
    # covers the same mechanism — either another registry query (checked to
    # carry an oracle) or a "file.py::test_name" pytest node for floors the
    # registry can't express. Turns "ungated by design" into a pointer at
    # the gate that does exist (tests/test_registry_window.py enforces it).
    gated_twin: str | None = None


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    family: str,
    oracle: str | None = None,
    bench: bool = True,
    gated_twin: str | None = None,
) -> Callable[[Builder], Builder]:
    """Register a query builder under ``name``.

    ``oracle`` is ANSI/DuckDB SQL equivalent to the Spark plan; ``None``
    marks a non-SQL-expressible op (driver falls back to rows-only check)
    and requires ``gated_twin`` to name its hash-gated counterpart.
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
            gated_twin=gated_twin,
        )
        return fn

    return deco


# The driver's correctness gate evaluates the FIRST 50 registry entries in
# iteration order. Round-8 window: the COMPLETE 37-query r3-stamp pool the
# r7 rotation left behind (after this gate no oracled stamp predates r4 —
# the every-query-restamped-under-current-code defense the r5–r7 windows
# built is finished), then one family-coverage pin per family the pool
# misses (the OLDEST stamp in each: aggregation/kafka/scans/sorts/syslog),
# then llm_hll_vocab_cardinality (re-stamped: its regime rule moved to the
# pinned 2-dp comparison this round), then the 7 queries ADDED in round 8
# taking first stamps. Everything rotated out keeps its stamp and stays
# covered on every pytest run by tests/test_inventory_oracle.py.
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- the complete remaining r3-stamp cohort (the r7 verdict's pool) ---
    "llm_hash_split",
    "llm_packing_efficiency",
    "llm_pii_redaction",
    "llm_simhash_multiprobe",
    "llm_stratified_sample",
    "llm_token_entropy",
    "llm_url_extraction",
    "llm_vocab_coverage",
    "llm_weighted_sample",
    "scalar_array_funcs",
    "scalar_bitwise_funcs",
    "scalar_edit_distance",
    "scalar_map_funcs",
    "scalar_posexplode_tokens",
    "scalar_struct_funcs",
    "scalar_trig_funcs",
    "scalar_url_funcs",
    "setop_multiset_all",
    "stream_session_window_agg",
    "stream_sliding_window_agg",
    "stream_static_join_agg",
    "stream_stream_join_agg",
    "tpch_disjunctive_predicates",
    "tpch_large_volume_customers",
    "tpch_market_share",
    "tpch_priority_wait_counts",
    "tpch_promo_revenue",
    "tpch_returned_item_accounts",
    "tpch_small_qty_revenue",
    "tpch_top_supplier_revenue",
    "window_funnel_conversion",
    "window_gapfill_daily",
    "window_lag_lead_gaps",
    "window_moving_avg_7d",
    "window_range_frame_hourly",
    "window_sessionize_30min",
    "window_share_of_total",
    # --- family coverage (oldest stamp per family the pool misses) ---
    "agg_corr_regression",
    "kafka_decode_roundtrip",
    "scan_orc_roundtrip",
    "sort_global_range_partitioned",
    "syslog_sd_params",
    # --- re-stamp: regime rule re-pinned at 2 dp this round ---
    "llm_hll_vocab_cardinality",
    # --- fresh r8 queries (first stamp) ---
    "llm_repeated_span_removal",
    "llm_ngram_novelty_curve",
    "llm_minhash_jaccard_calibration",
    "llm_pq_quantization_audit",
    "llm_embedding_covariance_audit",
    "stream_bloom_build",
    "stream_hll_build",
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
        curation_qa,
        extras,
        joins,
        kafka_roundtrip,
        llm,
        llm_scale,
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
