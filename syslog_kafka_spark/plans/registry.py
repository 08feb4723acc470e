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
# iteration order. Round-6 window = REGRESSION DEFENSE: with every oracled
# query cumulatively driver-green after r5, the window now holds (a) the 4
# queries needing a FRESH stamp — the two ANN queries newly hash-gated via
# frozen structures (operators/ann_frozen.py), winnowing (selection
# semantics changed to paper-faithful run-length dedup) and semantic
# dedup (pair scan moved to the per-block Arrow kernel) — (b) one
# family-coverage pin per family otherwise absent (oldest stamp in each),
# and (c) the 41 STALEST stamps (all 25 r1 + the 16 oldest r2), proving no
# silent regression under five rounds of refactors (spread(), hashed
# shingles, canonicalizer rewrite). The ~20 remaining r2 stamps
# (scalar/tpch/window families) are the r7 rotation pool. Everything
# rotated out keeps its stamp and stays covered every pytest run by
# tests/test_inventory_oracle.py.
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- fresh-stamp required: ANN hash-gated this round; winnowing
    # selection semantics changed this round; semantic dedup's pair scan
    # moved to the per-block Arrow kernel this round ---
    "llm_ann_srp_topk",
    "llm_ann_ivf_topk",
    "llm_winnowing_fingerprints",
    "llm_semantic_dedup",
    # --- family coverage (oldest stamp per otherwise-absent family) ---
    "kafka_decode_roundtrip",
    "scan_catalog_ctas",
    "sort_top_orders",
    "stream_custom_state_profile",
    "syslog_named_levels",
    # --- stalest stamps: the full r1 cohort ---
    "join_cross_region_nation",
    "join_exists_correlated",
    "join_full_outer_nation_counts",
    "join_in_subquery_vip_orders",
    "join_left_outer_order_counts",
    "join_local_supplier_volume",
    "join_range_error_burst",
    "join_semi_active_customers",
    "join_shipping_priority",
    "llm_bpe_token_counts",
    "llm_dedup_exact_stats",
    "llm_dedup_groups",
    "llm_embedding_neardup",
    "llm_fingerprint_collisions",
    "llm_langid_confusion",
    "llm_quality_scores",
    "llm_similarity_topk",
    "llm_term_freq",
    "llm_tfidf_rank",
    "llm_token_stats",
    "llm_word_bigrams",
    "reshape_pivot_event_counts",
    "reshape_unpivot_acctbal",
    "scalar_from_json_struct",
    "scalar_json_roundtrip",
    # --- stalest stamps: the oldest r2 cohort (with setops/windows
    # family representatives promoted over two later-alphabet scalars) ---
    "agg_collect_sorted",
    "agg_pricing_summary",
    "llm_decontamination",
    "llm_jaccard_neardup",
    "llm_media_features",
    "llm_minhash_estimate",
    "llm_minhash_lsh_pairs",
    "llm_pack_assignment",
    "llm_quality_repetition",
    "llm_simhash_neardup",
    "llm_unigram_logprob",
    "scalar_array_advanced",
    "scalar_casts_conditionals",
    "scalar_datetime_funcs",
    "setop_except",
    "window_first_last_value",
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
