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
# iteration order. Round-7 window: the 19 r2-stamped queries named by the
# r6 verdict as the rotation pool lead, then one family-coverage pin per
# family the pool misses (the OLDEST stamp in each:
# kafka/llm/scans/sorts/streaming/syslog), then the 6 stalest remaining r3
# stamps, then the 19 queries ADDED in round 7 taking first stamps (each
# displacement recorded in the inline comment below — the displaced r3
# re-stamps plus the r3/stream/tpch/window tails form the r8 pool).
# Everything rotated out keeps its stamp and stays covered on every pytest
# run by tests/test_inventory_oracle.py.
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- the complete r2-stamp cohort (the r6 verdict's rotation pool) ---
    "join_not_in_subquery",
    "scalar_explode_tokens",
    "scalar_json_funcs",
    "scalar_math_funcs",
    "scalar_regex_like",
    "scalar_string_funcs",
    "scalar_value_bucketing",
    "setop_intersect",
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
    # --- family coverage (oldest stamp per family the pool misses) ---
    "kafka_partitioner_histogram",
    "llm_curation_pipeline",
    "scan_json_lines",
    "sort_nulls_ordering",
    "stream_dedup_distinct_pairs",
    "syslog_parse_corpus",
    # --- stalest r3 stamps (alphabetically-first 25 of the remaining 43) ---
    "agg_bool_bitwise",
    "agg_key_skew_audit",
    "agg_rollup_cascade",
    "join_asof_next_signup",
    "llm_dedup_components",
    "llm_doc_chunks",
    # --- fresh r7 queries (first stamp; displaced r3 re-stamps → r8 pool:
    # llm_hash_split, llm_packing_efficiency,
    # llm_pii_redaction, llm_simhash_multiprobe, llm_stratified_sample,
    # llm_token_entropy, llm_url_extraction, llm_vocab_coverage,
    # llm_weighted_sample, scalar_array_funcs, scalar_bitwise_funcs,
    # scalar_edit_distance, scalar_map_funcs, scalar_posexplode_tokens,
    # scalar_struct_funcs, scalar_trig_funcs, scalar_url_funcs,
    # setop_multiset_all, stream_session_window_agg) ---
    "llm_hll_vocab_cardinality",
    "llm_kmv_source_overlap",
    "llm_length_quantile_sketch",
    "llm_semantic_decontamination",
    "llm_epoch_upsample_plan",
    "llm_shard_shuffle_assignment",
    "llm_source_overlap_matrix",
    "llm_bloom_decontamination",
    "llm_chunk_dedup_removal",
    "llm_cms_heavy_hitters",
    "llm_dedup_keep_best",
    "llm_domain_temperature_mix",
    "llm_embedding_dim_stats",
    "llm_mixture_subsample",
    "llm_scale_curation_funnel",
    "llm_session_transcripts",
    "stream_cms_sketch_build",
    "stream_ivf_list_routing",
    "stream_session_transcripts",
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
