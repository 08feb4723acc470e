"""Training-data curation operators: PII redaction, deterministic
dataset splitting, context-window chunking, and sequence-length
bucketing for packing.

These are the steps between "raw corpus" and "training shards" that a
100 TB pipeline runs after dedup/quality filtering (operators/dedup.py,
plans/llm.py) and before tokenizer/packing jobs. All pure Column
expressions (codegen'd, UDF-free) in the engine-portable regex/hash
subset, so every operator is oracle-checkable:

- redact_pii / pii_counts: scrub emails / IPv4s / phone-shaped numbers
  with RE2-safe patterns (Java regex and DuckDB's RE2 agree on them).
- hash_split: stable train/val/test assignment from the md5-derived
  hash64 of the document id — re-running the pipeline, adding executors,
  or re-partitioning can never move a document across splits (unlike
  rand()-based splitting).
- chunk_tokens: overlapping context windows (chunk_size tokens, stride
  apart) via sequence+slice — no explode of individual tokens, so the
  row blowup is #chunks, not #tokens.
- length_bucket: power-of-two sequence-length buckets for batch packing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from syslog_kafka_spark.functions.hashes import hash64, hash64_sql
from syslog_kafka_spark.functions.text import token_count, tokens

# (name, pattern, replacement) — patterns restricted to the Java/RE2
# common subset (no backrefs, no lookaround) so the DuckDB oracle matches.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its category placeholder. Patterns
    apply in list order, so earlier categories win overlaps (an email is
    redacted before its digits can look phone-shaped)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def redact_pii_sql(expr: str) -> str:
    """DuckDB twin of :func:`redact_pii` (same order, 'g' flag)."""
    for _, pattern, repl in PII_PATTERNS:
        sql_pattern = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pattern}', '{repl}', 'g')"
    return expr


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category match counts (for corpus audit dashboards)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pattern), 0))
        for name, pattern, _ in PII_PATTERNS
    }


def pii_counts_sql(expr: str) -> dict[str, str]:
    """DuckDB twin of :func:`pii_counts`."""
    out = {}
    for name, pattern, _ in PII_PATTERNS:
        sql_pattern = pattern.replace("'", "''")
        out[f"n_{name}"] = f"len(regexp_extract_all({expr}, '{sql_pattern}', 0))"
    return out


def hash_split(
    id_col: Column | str,
    *,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split-v1",
) -> Column:
    """Deterministic 'train'/'val'/'test' label from the id's salted
    hash64 mod 100. The salt versions the split: bump it to reshuffle,
    keep it to guarantee stability across pipeline runs."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = F.pmod(hash64(c.cast("string"), salt=salt), F.lit(100))
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def hash_split_sql(
    expr: str, *, train_pct: int = 80, val_pct: int = 10, salt: str = "split-v1"
) -> str:
    """DuckDB twin of :func:`hash_split`."""
    bucket = f"(({hash64_sql(f'CAST({expr} AS VARCHAR)', salt=salt)}) % 100)"
    return (
        f"CASE WHEN {bucket} < {train_pct} THEN 'train' "
        f"WHEN {bucket} < {train_pct + val_pct} THEN 'val' "
        f"ELSE 'test' END"
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode documents into overlapping context windows.

    One output row per (doc, chunk_start): `chunk_start` is the 1-based
    token index, `chunk_text` the space-joined window, `n_chunk_tokens`
    its length (the final window may be shorter). stride < chunk_size
    gives overlapping windows (pretraining-style); stride == chunk_size
    gives disjoint ones. The explode is over start offsets — #chunks per
    doc, not #tokens — so the shuffle volume is bounded by corpus bytes
    times the overlap factor."""
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(F.col("_toks")), F.lit(1)), F.lit(stride)
    )
    return (
        df.select(F.col(id_col), tokens(text_col).alias("_toks"))
        .withColumn("chunk_start", F.explode(starts))
        .select(
            id_col,
            "chunk_start",
            F.array_join(F.slice("_toks", F.col("chunk_start"), chunk_size), " ").alias(
                "chunk_text"
            ),
            F.size(F.slice("_toks", F.col("chunk_start"), chunk_size)).alias(
                "n_chunk_tokens"
            ),
        )
    )


def ngram_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 13,
    salt: str = "gram-v1",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Sliding word n-gram hashes per document: one row per (doc, gram).

    The hash is computed INSIDE the array transform, so only 8-byte
    hashes are exploded and shuffled — never the gram text. At 100 TB
    that is the difference between moving the corpus ~n times and moving
    ~8 bytes per token. Documents shorter than ``n`` tokens emit nothing.
    ``carry`` names extra columns to keep on each output row."""
    toks_df = df.select(
        F.col(id_col), *[F.col(c) for c in carry], tokens(text_col).alias("_toks")
    ).filter(F.size("_toks") >= n)
    starts = F.sequence(F.lit(1), F.size("_toks") - F.lit(n - 1))
    grams = F.transform(
        starts,
        lambda s: hash64(F.array_join(F.slice("_toks", s, n), " "), salt=salt),
    )
    return toks_df.select(id_col, *carry, F.explode(grams).alias("gram_hash"))


def ngram_hashes_sql(
    toks_expr: str, *, n: int = 13, salt: str = "gram-v1"
) -> tuple[str, str]:
    """DuckDB twin of :func:`ngram_hashes`: (gram_hash expr over a start
    offset ``s``, the FROM-clause unnest generating ``s``). Compose as
    ``SELECT ..., {expr} AS gram_hash FROM d, {unnest} WHERE len(toks) >= n``."""
    gram = f"array_to_string(list_slice({toks_expr}, s, s + {n - 1}), ' ')"
    expr = hash64_sql(gram, salt=salt)
    unnest = f"unnest(generate_series(1, len({toks_expr}) - {n - 1})) AS _t(s)"
    return expr, unnest


def pack_bins(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    context_len: int = 256,
    n_shards: int = 8,
    salt: str = "pack-v1",
) -> DataFrame:
    """Concat-and-chop packing assignment (the GPT-style pretraining
    layout): documents are concatenated in id order and chopped into
    fixed ``context_len`` windows; each document's bin is the window its
    first token lands in, and ``crosses_boundary`` marks documents split
    across two windows.

    Distributed shape: packing is per-shard (salted hash of the id), so
    the running-offset window partitions ``n_shards`` ways instead of
    collapsing onto one task — shards are the physical unit a real
    packing job writes anyway. Within a shard the cumulative sum is one
    window over one sort, no self-join."""
    from pyspark.sql import Window

    n_tok = token_count(text_col)
    shard = F.pmod(hash64(F.col(id_col).cast("string"), salt=salt), F.lit(n_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = df.select(
        F.col(id_col), shard.cast("int").alias("shard"), n_tok.alias("n_tokens")
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        base.withColumn("first_token", offset)
        .withColumn("bin", (F.col("first_token") / context_len).cast("bigint"))
        .withColumn(
            "crosses_boundary",
            (
                ((F.col("first_token") + F.col("n_tokens") - 1) / context_len).cast("bigint")
                != F.col("bin")
            ),
        )
    )


def pack_bins_sql(
    toks_expr: str,
    *,
    context_len: int = 256,
    n_shards: int = 8,
    salt: str = "pack-v1",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`pack_bins` over the documents table: a CTE
    body yielding (doc_id, shard, n_tokens, first_token, bin,
    crosses_boundary)."""
    shard = f"(({hash64_sql(f'CAST({id_expr} AS VARCHAR)', salt=salt)}) % {n_shards})"
    return f"""
        WITH _pb_base AS (
          SELECT {id_expr} AS doc_id, CAST({shard} AS INT) AS shard,
                 len({toks_expr}) AS n_tokens
          FROM documents
        ), _pb_off AS (
          SELECT doc_id, shard, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS first_token
          FROM _pb_base
        )
        SELECT doc_id, shard, n_tokens, first_token,
               CAST(floor(first_token / {context_len}.0) AS BIGINT) AS bin,
               CAST(floor((first_token + n_tokens - 1) / {context_len}.0) AS BIGINT)
                 <> CAST(floor(first_token / {context_len}.0) AS BIGINT) AS crosses_boundary
        FROM _pb_off
    """


def length_bucket(n_tokens: Column | str) -> Column:
    """Power-of-two sequence-length bucket lower bound (0, 16, 32, 64,
    128, 256, 512) for packing/batching — documents in one bucket pad to
    at most 2x their bucket floor."""
    n = F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens
    return (
        F.when(n < 16, F.lit(0))
        .when(n < 32, F.lit(16))
        .when(n < 64, F.lit(32))
        .when(n < 128, F.lit(64))
        .when(n < 256, F.lit(128))
        .when(n < 512, F.lit(256))
        .otherwise(F.lit(512))
    )


def length_bucket_sql(expr: str) -> str:
    """DuckDB twin of :func:`length_bucket`."""
    return (
        f"CASE WHEN {expr} < 16 THEN 0 WHEN {expr} < 32 THEN 16 "
        f"WHEN {expr} < 64 THEN 32 WHEN {expr} < 128 THEN 64 "
        f"WHEN {expr} < 256 THEN 128 WHEN {expr} < 512 THEN 256 "
        f"ELSE 512 END"
    )


def pad_ceiling(n_tokens: Column | str) -> Column:
    """Pad target for a sequence: the smallest power-of-two ≥ n_tokens
    (minimum 16, capped at 1024) — the batch shape a bucketed loader pads
    to. Waste = pad_ceiling - n_tokens."""
    n = F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens
    out = F.lit(1024)
    for p in (512, 256, 128, 64, 32, 16):
        out = F.when(n <= p, F.lit(p)).otherwise(out)
    return out


def pad_ceiling_sql(expr: str) -> str:
    """DuckDB twin of :func:`pad_ceiling`."""
    return (
        f"CASE WHEN {expr} <= 16 THEN 16 WHEN {expr} <= 32 THEN 32 "
        f"WHEN {expr} <= 64 THEN 64 WHEN {expr} <= 128 THEN 128 "
        f"WHEN {expr} <= 256 THEN 256 WHEN {expr} <= 512 THEN 512 "
        f"ELSE 1024 END"
    )
