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
# iteration order. Round-13 window (the r12 verdict's prescription,
# VERDICT.md item #1): FIRST the two queries registered after the r12
# window filled — the only oracled inventory entries the driver has never
# independently stamped (llm_neardup_pair_digest, llm_lsh_occupancy_capped
# — both oracle-verified on every pytest run by tests/test_inventory_oracle
# in the meantime), then the SEVEN r7-stamp llm deferrals the r12 comment
# named (llm_dedup_keep_best, llm_domain_temperature_mix,
# llm_embedding_dim_stats, llm_epoch_upsample_plan, llm_mixture_subsample,
# llm_session_transcripts, llm_shard_shuffle_assignment — after this
# window no stamp predates r8), then ONE family-coverage pin per family
# the rest of the window misses, oldest stamp each
# (kafka_partitioner_histogram r11, sort_mixed_direction r9,
# syslog_severity_histogram r9), then the r8-stamp cohort. That cohort
# holds 47 entries: 2 + 7 + 3 + 47 = 59 > 50, so NINE llm-family r8
# entries are DEFERRED to r14 (llm still holds 15 of the 50 window
# slots): llm_pii_redaction, llm_pq_quantization_audit,
# llm_repeated_span_removal, llm_simhash_multiprobe,
# llm_stratified_sample, llm_token_entropy, llm_url_extraction,
# llm_vocab_coverage, llm_weighted_sample — all nine stay oracle-covered
# on every pytest run in the meantime.
#
# Round-14 rotation pool, in priority order: FIRST the SEVEN r13
# registrations, taking their first stamps (llm_minhash_band_digest,
# llm_lsh_cap_sweep, llm_soft_dedup_weights, llm_ann_recall_audit,
# llm_unigram_kl_drift, llm_quality_gate_sweep,
# stream_quality_gate_monitor — each stays oracle-covered on every
# pytest run by tests/test_inventory_oracle in the meantime), then the
# NINE llm r14
# deferrals above, then the r9-stamp cohort (the oldest after the r13
# gate), then r10-stamp entries to fill the window, keeping the
# every-family-in-window invariant (tests/test_registry_window.py) ahead
# of stamp age.
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- late-r12 registrations: first driver stamps (verdict item #1) ---
    "llm_neardup_pair_digest",
    "llm_lsh_occupancy_capped",
    # --- the seven r7-stamp llm deferrals from the r12 window ---
    "llm_dedup_keep_best",
    "llm_domain_temperature_mix",
    "llm_embedding_dim_stats",
    "llm_epoch_upsample_plan",
    "llm_mixture_subsample",
    "llm_session_transcripts",
    "llm_shard_shuffle_assignment",
    # --- family coverage (oldest stamp per family the cohort misses) ---
    "kafka_partitioner_histogram",
    "sort_mixed_direction",
    "syslog_severity_histogram",
    # --- 38 of the 47-entry r8-stamp cohort (9 llm deferred to r14) ---
    "agg_corr_regression",
    "llm_embedding_covariance_audit",
    "llm_hash_split",
    "llm_hll_vocab_cardinality",
    "llm_minhash_jaccard_calibration",
    "llm_ngram_novelty_curve",
    "llm_packing_efficiency",
    "scalar_array_funcs",
    "scalar_bitwise_funcs",
    "scalar_edit_distance",
    "scalar_map_funcs",
    "scalar_posexplode_tokens",
    "scalar_struct_funcs",
    "scalar_trig_funcs",
    "scalar_url_funcs",
    "scan_orc_roundtrip",
    "setop_multiset_all",
    "stream_bloom_build",
    "stream_hll_build",
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
