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
# iteration order. Round-11 window (the r10 verdict's prescription,
# VERDICT.md item #1): FIRST the two queries registered after the r10
# window filled — the only inventory entries the driver has never
# independently stamped (stream_decontamination_probe,
# llm_bpe_encode_frozen — the late-registration precedent; both
# oracle-verified on every pytest run by tests/test_inventory_oracle in
# the meantime), then the FOUR r5-stamp stragglers deferred from the r10
# window (agg_conditional, agg_cube_orders, agg_grouping_sets,
# agg_min_max_extremes — after this window no stamp predates r6 except
# the named tail deferrals), then ONE family-coverage pin per family the
# rest of the window misses (the oldest stamp in each:
# kafka_partitioner_histogram r9, setop_except r6, sort_nulls_ordering
# r7, syslog_parse_corpus r7, window_first_last_value r6 — setop_except
# and window_first_last_value double as their cohort's oldest stamps, so
# the r10 verdict's plan to defer them yields to the
# every-family-in-window invariant), then 39 of the 47-entry r6-stamp
# cohort the r10 registry comment named. 2 + 4 + 5 + 47 - 2(pinned
# above) = 56 > 50: the SIX entries DEFERRED to r12 are
# stream_custom_state_profile (the verdict's named tail deferral) plus
# five from the text-stats corner of the llm family, whose window
# representation stays 25-strong (llm_langid_confusion,
# llm_quality_repetition, llm_term_freq, llm_token_stats,
# llm_word_bigrams) — all six stay oracle-covered on every pytest run in
# the meantime.
#
# Round-12 rotation pool, in priority order: FIRST the queries
# registered after this window filled, taking their first stamps
# (the r11 additions: llm_bpe_encode_table and
# stream_bpe_encode_fertility — both oracle-covered on every pytest run
# by tests/test_inventory_oracle in the meantime), then the SIX
# r12 deferrals above, then the r7-stamp cohort (the oldest after the r11
# gate): llm_bloom_decontamination, llm_chunk_dedup_removal,
# llm_cms_heavy_hitters, llm_curation_pipeline, llm_dedup_components,
# llm_doc_chunks, llm_domain_temperature_mix, llm_embedding_dim_stats,
# llm_epoch_upsample_plan, llm_kmv_source_overlap,
# llm_length_quantile_sketch, llm_mixture_subsample,
# llm_scale_curation_funnel, llm_semantic_decontamination,
# llm_session_transcripts, llm_shard_shuffle_assignment,
# llm_source_overlap_matrix, scan_json_lines, stream_cms_sketch_build,
# stream_ivf_list_routing, stream_session_transcripts,
# syslog_parse_corpus — then r8-stamp entries to fill the window.
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- late-r10 registrations: first driver stamps (verdict item #1) ---
    "stream_decontamination_probe",
    "llm_bpe_encode_frozen",
    # --- the four r5-stamp stragglers deferred from the r10 window ---
    "agg_conditional",
    "agg_cube_orders",
    "agg_grouping_sets",
    "agg_min_max_extremes",
    # --- family coverage (oldest stamp per family the cohort misses) ---
    "kafka_partitioner_histogram",
    "setop_except",
    "sort_nulls_ordering",
    "syslog_parse_corpus",
    "window_first_last_value",
    # --- 39 of the 47-entry r6-stamp cohort (r10 registry comment) ---
    "agg_collect_sorted",
    "agg_pricing_summary",
    "join_cross_region_nation",
    "join_exists_correlated",
    "join_full_outer_nation_counts",
    "join_in_subquery_vip_orders",
    "join_left_outer_order_counts",
    "join_local_supplier_volume",
    "join_range_error_burst",
    "join_semi_active_customers",
    "join_shipping_priority",
    "llm_ann_ivf_topk",
    "llm_ann_srp_topk",
    "llm_bpe_token_counts",
    "llm_decontamination",
    "llm_dedup_exact_stats",
    "llm_dedup_groups",
    "llm_embedding_neardup",
    "llm_fingerprint_collisions",
    "llm_jaccard_neardup",
    "llm_media_features",
    "llm_minhash_estimate",
    "llm_minhash_lsh_pairs",
    "llm_pack_assignment",
    "llm_quality_scores",
    "llm_semantic_dedup",
    "llm_simhash_neardup",
    "llm_similarity_topk",
    "llm_tfidf_rank",
    "llm_unigram_logprob",
    "llm_winnowing_fingerprints",
    "reshape_pivot_event_counts",
    "reshape_unpivot_acctbal",
    "scalar_array_advanced",
    "scalar_casts_conditionals",
    "scalar_datetime_funcs",
    "scalar_from_json_struct",
    "scalar_json_roundtrip",
    "scan_catalog_ctas",
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
