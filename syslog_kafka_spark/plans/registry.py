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
# iteration order. Round-12 window (the r11 verdict's prescription,
# VERDICT.md item #1): FIRST the two queries registered after the r11
# window filled — the only oracled inventory entries the driver has never
# independently stamped (llm_bpe_encode_table,
# stream_bpe_encode_fertility — both oracle-verified on every pytest run
# by tests/test_inventory_oracle in the meantime), then the SIX r6-stamp
# deferrals the r11 comment named (stream_custom_state_profile,
# llm_langid_confusion, llm_quality_repetition, llm_term_freq,
# llm_token_stats, llm_word_bigrams — after this window no stamp
# predates r7), then ONE family-coverage pin per family the rest of the
# window misses, oldest stamp each (kafka_decode_roundtrip r10,
# sort_global_range_partitioned r8, syslog_sd_params r8 —
# syslog_parse_corpus from the r11 comment's pool was freshly stamped
# r11, so the family pin moves to the family's oldest stamp), then the
# r7-stamp cohort. That cohort holds 46 entries, not the 22 the r11
# comment named (the r11 window itself only refreshed 50 of the then-r7
# pool, and the comment predated those stamps): 2 + 6 + 3 + 46 = 57 > 50,
# so SEVEN llm-family r7 entries are DEFERRED to r13 (llm keeps 17 of the
# 50 window slots regardless): llm_dedup_keep_best,
# llm_domain_temperature_mix, llm_embedding_dim_stats,
# llm_epoch_upsample_plan, llm_mixture_subsample, llm_session_transcripts,
# llm_shard_shuffle_assignment — all seven stay oracle-covered on every
# pytest run in the meantime.
#
# Round-13 rotation pool, in priority order: FIRST the queries registered
# after this window filled (taking their first stamps — as of this
# writing llm_neardup_pair_digest and llm_lsh_occupancy_capped, both
# registered r12 and oracle-covered on every pytest run by
# tests/test_inventory_oracle in the meantime), then the SEVEN llm
# r13 deferrals above, then the r8-stamp cohort (the oldest after the
# r12 gate): agg_corr_regression, llm_embedding_covariance_audit,
# llm_hash_split, llm_hll_vocab_cardinality,
# llm_minhash_jaccard_calibration, llm_ngram_novelty_curve,
# llm_packing_efficiency, llm_pii_redaction, llm_pq_quantization_audit,
# llm_repeated_span_removal, llm_simhash_multiprobe,
# llm_stratified_sample, llm_token_entropy, llm_url_extraction,
# llm_vocab_coverage, llm_weighted_sample, scalar_array_funcs,
# scalar_bitwise_funcs, scalar_edit_distance, scalar_map_funcs,
# scalar_posexplode_tokens, scalar_struct_funcs, scalar_trig_funcs,
# scalar_url_funcs, scan_orc_roundtrip, setop_multiset_all,
# sort_global_range_partitioned (if not refreshed here), stream_bloom_build,
# stream_hll_build, stream_session_window_agg, stream_sliding_window_agg,
# stream_static_join_agg, stream_stream_join_agg, syslog_sd_params,
# tpch_disjunctive_predicates, tpch_large_volume_customers,
# tpch_market_share, tpch_priority_wait_counts, tpch_promo_revenue,
# tpch_returned_item_accounts, tpch_small_qty_revenue,
# tpch_top_supplier_revenue, window_funnel_conversion,
# window_gapfill_daily, window_lag_lead_gaps, window_moving_avg_7d,
# window_range_frame_hourly, window_sessionize_30min,
# window_share_of_total — then r9-stamp entries to fill the window,
# keeping the every-family-in-window invariant
# (tests/test_registry_window.py) ahead of stamp age.
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- late-r11 registrations: first driver stamps (verdict item #1) ---
    "llm_bpe_encode_table",
    "stream_bpe_encode_fertility",
    # --- the six r6-stamp deferrals from the r11 window ---
    "stream_custom_state_profile",
    "llm_langid_confusion",
    "llm_quality_repetition",
    "llm_term_freq",
    "llm_token_stats",
    "llm_word_bigrams",
    # --- family coverage (oldest stamp per family the cohort misses) ---
    "kafka_decode_roundtrip",
    "sort_global_range_partitioned",
    "syslog_sd_params",
    # --- 39 of the 46-entry r7-stamp cohort (7 llm deferred to r13) ---
    "agg_bool_bitwise",
    "agg_key_skew_audit",
    "agg_rollup_cascade",
    "join_asof_next_signup",
    "join_not_in_subquery",
    "llm_bloom_decontamination",
    "llm_chunk_dedup_removal",
    "llm_cms_heavy_hitters",
    "llm_curation_pipeline",
    "llm_dedup_components",
    "llm_doc_chunks",
    "llm_kmv_source_overlap",
    "llm_length_quantile_sketch",
    "llm_scale_curation_funnel",
    "llm_semantic_decontamination",
    "llm_source_overlap_matrix",
    "scalar_explode_tokens",
    "scalar_json_funcs",
    "scalar_math_funcs",
    "scalar_regex_like",
    "scalar_string_funcs",
    "scalar_value_bucketing",
    "scan_json_lines",
    "setop_intersect",
    "stream_cms_sketch_build",
    "stream_dedup_distinct_pairs",
    "stream_ivf_list_routing",
    "stream_session_transcripts",
    "tpch_above_nation_average",
    "tpch_min_cost_supplier",
    "tpch_nation_volume_flow",
    "tpch_order_count_distribution",
    "tpch_profit_by_nation",
    "tpch_scalar_subquery_filter",
    "tpch_waiting_suppliers",
    "window_rank_family",
    "window_running_spend",
    "window_top3_orders_per_cust",
    "window_tumbling_batch_twin",
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
