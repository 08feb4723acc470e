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
            bench=bench,
            gated_twin=gated_twin,
        )
        return fn

    return deco


# The driver's correctness gate evaluates the FIRST 50 registry entries in
# iteration order. Round-10 window (the r9 verdict's prescription): FIRST
# the four queries registered after the r9 window closed — the only
# then-inventory entries the driver had never independently stamped
# (llm_bpe_merge_candidates, llm_ivf_refit_drift_audit,
# stream_ivf_refit_drift, stream_bpe_merge_candidates — the
# stream_ivf_list_routing / late-r8 precedent), then the three queries
# ADDED in round 10 taking first stamps (the frozen-64 re-fit near-dup
# tier, the iterated BPE merge-apply loop, and the streaming LSH probe
# twin), then 40 of the 44-query r5-stamp pool the r9 registry comment
# named, then one family-coverage pin per family the pool misses (kafka /
# sorts / syslog — the oldest stamp in each). The window was
# over-subscribed by one before the three r10 additions (4+44+3 = 51); the
# four r5-pool entries DEFERRED to r11 are: agg_conditional,
# agg_cube_orders, agg_grouping_sets, agg_min_max_extremes (the
# aggregation family keeps 9 other entries in-window, every deferred query
# stays oracle-covered on each pytest run by tests/test_inventory_oracle).
#
# Round-11 rotation pool, in priority order: FIRST the two queries
# registered after the r10 window filled — stream_decontamination_probe
# and llm_bpe_encode_frozen (the late-registration precedent; both
# oracle-verified on every pytest run by tests/test_inventory_oracle in
# the meantime), then the four deferred r5
# stamps above, then the r6-stamp cohort (the oldest after the r10 gate;
# 47 entries once sort_top_orders / syslog_named_levels take r10 pin
# stamps below): agg_collect_sorted, agg_pricing_summary,
# join_cross_region_nation, join_exists_correlated,
# join_full_outer_nation_counts, join_in_subquery_vip_orders,
# join_left_outer_order_counts, join_local_supplier_volume,
# join_range_error_burst, join_semi_active_customers,
# join_shipping_priority, llm_ann_ivf_topk, llm_ann_srp_topk,
# llm_bpe_token_counts, llm_decontamination, llm_dedup_exact_stats,
# llm_dedup_groups, llm_embedding_neardup, llm_fingerprint_collisions,
# llm_jaccard_neardup, llm_langid_confusion, llm_media_features,
# llm_minhash_estimate, llm_minhash_lsh_pairs, llm_pack_assignment,
# llm_quality_repetition, llm_quality_scores, llm_semantic_dedup,
# llm_simhash_neardup, llm_similarity_topk, llm_term_freq, llm_tfidf_rank,
# llm_token_stats, llm_unigram_logprob, llm_winnowing_fingerprints,
# llm_word_bigrams, reshape_pivot_event_counts, reshape_unpivot_acctbal,
# scalar_array_advanced, scalar_casts_conditionals, scalar_datetime_funcs,
# scalar_from_json_struct, scalar_json_roundtrip, scan_catalog_ctas,
# setop_except, stream_custom_state_profile, window_first_last_value
# (2 + 4 + 47 = 53 > 50: the THREE tail entries deferring to r12 are
# setop_except, stream_custom_state_profile, and window_first_last_value —
# all stay oracle-covered on every pytest run in the meantime).
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- late-r9 registrations: first driver stamps (verdict item #1) ---
    "llm_bpe_merge_candidates",
    "llm_ivf_refit_drift_audit",
    "stream_ivf_refit_drift",
    "stream_bpe_merge_candidates",
    # --- fresh r10 queries (first stamp) ---
    "llm_embedding_neardup_refit64",
    "llm_bpe_merge_apply",
    "stream_lsh_probe_digest",
    # --- 40 of the r5-stamp cohort (the r9 verdict's pool) ---
    "agg_count_if_extrema_by",
    "agg_exact_percentiles",
    "agg_group_by_all",
    "agg_having_big_customers",
    "agg_integrity_audit",
    "agg_multi_distinct",
    "agg_revenue_forecast",
    "agg_rollup_revenue",
    "agg_stats_moments",
    "join_anti_silent_customers",
    "join_asof_last_error",
    "join_broadcast_brand_volume",
    "join_lateral_dataframe_api",
    "join_scd2_point_in_time",
    "llm_arrow_native_lengths",
    "llm_chunk_dedup",
    "llm_domain_mixture",
    "llm_dsir_importance",
    "llm_embedding_centroid_audit",
    "llm_gopher_rules",
    "llm_leakage_safe_split",
    "llm_media_frame_sample",
    "llm_tokenizer_fertility",
    "llm_url_canonical_dedup",
    "reshape_pivot_multi_agg",
    "scalar_collation_caseless",
    "scalar_interval_arithmetic",
    "scalar_sql_scripting",
    "scalar_sql_udf",
    "scan_agg_pushdown",
    "scan_csv_typed",
    "scan_observe_metrics",
    "scan_xml_roundtrip",
    "setop_union_distinct",
    "stream_available_now_trigger",
    "stream_static_anti_dedup",
    "stream_stream_left_outer_join",
    "stream_tumbling_window_agg",
    "window_cohort_retention",
    "window_nth_value_snapshots",
    # --- family coverage (oldest stamp per family the pool misses) ---
    "kafka_decode_roundtrip",
    "sort_top_orders",
    "syslog_named_levels",
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
