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
# iteration order. Round-4 window: the 6 queries that had never carried a
# driver stamp (the scans pair now has inline-VALUES oracles so the gate's
# DuckDB needs no file access), the 40 new round-4 queries (five batches:
# parser/wire/mining/storage/join depth; analytics batch 2 — LATERAL,
# LISTAGG, regr_*, DQ audit, EWMA, z-score, quantization, JL projection,
# try_*; Spark-4 API batch 3 — Python DataSource batch + streaming,
# state-store reader, chained stateful windows, parameterized SQL, Python
# UDTF; feature batch 4 — pipe SQL, collations, median+MAD, MoM change,
# containment dedup, degree distribution, catalog CTAS; batch 5 — sparse
# TF-IDF cosine join, null-safe join, within-watermark dedup, map
# lambdas, dedup-then-LSH composite), and SemDeDup —
# upgraded this round from rows-only to a full hash oracle (frozen
# centroids) and re-windowed so the upgrade gets stamped.
# The remaining 4 slots backfill with the oldest stamps that keep every
# family represented. Everything rotated out is green in CORRECTNESS_r01/r02/r03
# and stays covered by the pytest oracle suite
# (tests/test_inventory_oracle.py).
WINDOW_PRIORITY: tuple[str, ...] = (
    # --- never driver-stamped (oracled since r3) ---
    "join_asof_tolerance",
    "window_gapfill_interpolate",
    "stream_foreach_batch_sink",
    "llm_length_buckets",
    "scan_csv_typed",
    "scan_json_lines",
    # --- new r4 ---
    "syslog_sd_params",
    "kafka_decode_roundtrip",
    "llm_zipf_slope",
    "llm_pmi_collocations",
    "llm_bigram_logprob",
    "window_rolling_distinct_users",
    "scan_orc_roundtrip",
    "scan_partition_pruned",
    "join_salted_skew",
    "join_bucketed_colocated",
    "join_right_outer_segment_counts",
    "agg_recursive_month_spine",
    "scalar_variant_extract",
    # --- new r4, batch 2 (LATERAL, LISTAGG, regr_* moments, DQ audit,
    # EWMA fold, z-score anomalies, int8 quantization, JL projection,
    # try_* arithmetic) ---
    "join_lateral_topk",
    "agg_listagg_nations",
    "agg_corr_regression",
    "agg_integrity_audit",
    "window_ewma_user_value",
    "window_zscore_anomaly",
    "llm_embedding_quantization",
    "llm_random_projection",
    "scalar_try_arith",
    # --- new r4, batch 3 (Spark-4 API surfaces: Python DataSource batch +
    # streaming, state-store reader, chained stateful windows,
    # parameterized SQL, Python UDTF) ---
    "scan_python_datasource",
    "stream_python_datasource_tail",
    "stream_state_store_read",
    "stream_chained_window_rollup",
    "scalar_parameterized_sql",
    "llm_udtf_concordance",
    # --- new r4, batch 4 (pipe SQL, collations, robust stats, MoM change,
    # containment dedup, near-dup degree distribution, catalog CTAS) ---
    "scalar_pipe_syntax",
    "scalar_collation_caseless",
    "agg_median_mad",
    "window_pct_change_mom",
    "llm_containment_neardup",
    "llm_neardup_degree_dist",
    "scan_catalog_ctas",
    # --- new r4, batch 5 (sparse TF-IDF cosine join, null-safe join,
    # within-watermark dedup, higher-order map functions) ---
    "llm_tfidf_cosine_pairs",
    "join_null_safe_groups",
    "stream_dedup_within_watermark",
    "scalar_map_higher_order",
    "llm_dedup_then_lsh",
    # --- oracle upgraded r4 (was rows-only) ---
    "llm_semantic_dedup",
    # NOTE: reshape_pivot_multi_agg, window_cohort_retention, and
    # window_nth_value_snapshots (newest r4 additions) did not fit this
    # round's 50-slot window — they are pytest-oracled now and first in
    # line for the r5 rotation.
    # --- backfill: oldest stamps, family coverage ---
    # --- family coverage (oldest remaining stamps are r2) ---
    "setop_union_all",
    "sort_nulls_ordering",
    "syslog_parse_corpus",
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
