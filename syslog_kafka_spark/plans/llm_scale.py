"""Scale-path curation operators: the 100 TB-shaped variants of the
curation tier — constant-memory Bloom decontamination, disjoint-chunk
exact dedup, domain temperature mixing, and embedding-space audits.

Each query here exists because its naive sibling stops working at
corpus scale: an exact-gram decontamination join needs the train gram
set shuffled or broadcast (GBs at 100 TB — the Bloom filter is ~8 KB),
document-level dedup misses the boilerplate a chunk-level pass removes
(C4's recipe), and mixture weights / embedding audits are the
dashboard aggregations every curation run re-derives. All are pure
Column expressions over the house md5-derived ``hash64`` so every
query is DuckDB-oracle-checkable bit-for-bit.

Reference scope: the engine's curation tier (SURVEY §2B.10); no
reference-repo analog (the reference at syslog/syslog_producer.go is a
transport, not a curation engine).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from syslog_kafka_spark.functions.hashes import hash64, hash64_sql
from syslog_kafka_spark.functions.text import token_count
from syslog_kafka_spark.plans.registry import query
from syslog_kafka_spark.sources.readers import load_tables

_TOKENS_SQL = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t != '')"

# ---------------------------------------------------------------------------
# Domain temperature mixing
# ---------------------------------------------------------------------------

_MIX_ALPHAS = (0.3, 0.5, 0.7)


def _temperature_mix_oracle() -> str:
    w_cols = ",\n               ".join(
        f"ROUND(power(CAST(sum_tokens AS DOUBLE), {a}) /"
        f" sum(power(CAST(sum_tokens AS DOUBLE), {a})) OVER (), 6)"
        f" AS w_a{int(a * 100)}"
        for a in _MIX_ALPHAS
    )
    return f"""
        WITH per AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum(len({_TOKENS_SQL})) AS BIGINT) AS sum_tokens
          FROM documents GROUP BY source
        )
        SELECT source, n_docs, sum_tokens,
               ROUND(sum_tokens * 100.0 / sum(sum_tokens) OVER (), 4) AS p_pct,
               {w_cols},
               ROUND(power(CAST(sum_tokens AS DOUBLE), 0.5)
                     / sum(power(CAST(sum_tokens AS DOUBLE), 0.5)) OVER ()
                     * sum(sum_tokens) OVER () / sum_tokens, 4) AS epochs_a50
        FROM per ORDER BY source
    """


@query("llm_domain_temperature_mix", family="llm", oracle=_temperature_mix_oracle())
def llm_domain_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain sampling weights (the multilingual-LM
    mixing recipe: w_d ∝ p_d^α): per-source token mass, its natural
    share, the α-sweep of sampling weights, and the effective epochs
    each domain sees under α=0.5 at a one-epoch token budget (>1 means
    the sampler repeats the domain; the standard over-sampling audit).

    Distributed shape: one map-side-combinable groupBy over the corpus;
    the α-sweep runs on the ~#domains-row aggregate, so the unbounded
    window is over a frame that fits in one task at any corpus size.
    pow() may differ from the oracle's libm in the last ulp — weights
    are reported at 6 dp where a 1-ulp slip cannot flip the rounding."""
    d = load_tables(spark, sf_dir).documents
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("sum_tokens"),
    )
    w = Window.partitionBy()
    tok_d = F.col("sum_tokens").cast("double")
    total = F.sum("sum_tokens").over(w)
    cols = [
        F.col("source"),
        F.col("n_docs"),
        F.col("sum_tokens"),
        F.round(F.col("sum_tokens") * 100.0 / total, 4).alias("p_pct"),
    ]
    for a in _MIX_ALPHAS:
        share = F.pow(tok_d, F.lit(a)) / F.sum(F.pow(tok_d, F.lit(a))).over(w)
        cols.append(F.round(share, 6).alias(f"w_a{int(a * 100)}"))
    share50 = F.pow(tok_d, F.lit(0.5)) / F.sum(F.pow(tok_d, F.lit(0.5))).over(w)
    cols.append(F.round(share50 * total / F.col("sum_tokens"), 4).alias("epochs_a50"))
    return per.select(*cols).orderBy("source")


# ---------------------------------------------------------------------------
# Embedding-space audit
# ---------------------------------------------------------------------------

_DIM_STATS_ORACLE = """
    WITH v AS (
      SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS _t(i)
    )
    SELECT dim, count(*) AS n,
           ROUND(avg(x), 4) AS mean_x,
           ROUND(var_pop(x), 4) AS var_x,
           ROUND(min(x), 6) AS min_x,
           ROUND(max(x), 6) AS max_x
    FROM v GROUP BY dim ORDER BY dim
"""


@query("llm_embedding_dim_stats", family="llm", oracle=_DIM_STATS_ORACLE)
def llm_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding-space audit: mean / population variance /
    range for each of the 64 dimensions — the collapse detector every
    embedding pipeline runs before trusting cosine geometry (a dimension
    with ~zero variance is dead weight in every distance computation;
    a mean far from 0 says the corpus needs centering before IVF/PQ).

    Distributed shape: posexplode emits (dim, value) pairs — 64 rows per
    vector — into a 64-group aggregate with map-side partials, so the
    shuffle is #partitions × 64 rows regardless of corpus size. Float
    accumulation order differs across partitionings; stats are reported
    rounded (4 dp) where the ulp-level reorder noise cannot surface."""
    e = load_tables(spark, sf_dir).embeddings
    v = e.select(F.posexplode("embedding").alias("dim", "x")).select(
        "dim", F.col("x").cast("double").alias("x")
    )
    return (
        v.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("x"), 4).alias("mean_x"),
            F.round(F.var_pop("x"), 4).alias("var_x"),
            F.round(F.min("x"), 6).alias("min_x"),
            F.round(F.max("x"), 6).alias("max_x"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Chunk-level exact dedup (C4-style)
# ---------------------------------------------------------------------------

_CHUNK_DEDUP_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ), ch AS (
      SELECT doc_id, s AS chunk_start,
             {hash64_sql("array_to_string(list_slice(toks, s, s + 31), ' ')", salt="chunk-v1")}
               AS chunk_hash,
             len(list_slice(toks, s, s + 31)) AS n_chunk_tokens
      FROM d, unnest(generate_series(1, greatest(len(toks), 1), 32)) AS _t(s)
    ), rn AS (
      SELECT doc_id, n_chunk_tokens,
             row_number() OVER (PARTITION BY chunk_hash
                                ORDER BY doc_id, chunk_start) AS rk
      FROM ch
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(sum(CASE WHEN rk > 1 THEN n_chunk_tokens ELSE 0 END) AS BIGINT)
             AS dup_tokens,
           ROUND(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) * 100.0 / count(*), 2)
             AS pct_removed
    FROM rn GROUP BY doc_id ORDER BY doc_id
"""


@query("llm_chunk_dedup_removal", family="llm", oracle=_CHUNK_DEDUP_ORACLE)
def llm_chunk_dedup_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup (the C4 recipe, fixed 32-token disjoint
    windows instead of line splits): every chunk occurrence after the
    first — ordered by (doc_id, chunk_start), the deterministic
    keep-first rule — is marked removable, and the audit reports each
    document's removable chunk/token mass (keep-first rule over the
    global (doc_id, chunk_start) order; complements llm_chunk_dedup's
    cross-document recurrence report). Catches the boilerplate and
    shared-header duplication that document-level exact dedup
    (llm_dedup_exact_stats) misses entirely.

    Distributed shape: disjoint stride means the chunk explode is a 1×
    row blowup; only 8-byte chunk hashes shuffle, keyed by the hash
    itself (uniform — no skew), one window pass + one groupBy. At
    100 TB this is two shuffles of ~(corpus tokens / 32) fixed-width
    rows — the same shape C4 ran at web scale."""
    from syslog_kafka_spark.operators.curation import chunk_tokens

    d = load_tables(spark, sf_dir).documents
    ch = chunk_tokens(d, chunk_size=32, stride=32).select(
        "doc_id",
        "chunk_start",
        hash64("chunk_text", salt="chunk-v1").alias("chunk_hash"),
        "n_chunk_tokens",
    )
    rk = F.row_number().over(
        Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_start")
    )
    dup = (ch.withColumn("rk", rk)).withColumn("is_dup", F.col("rk") > 1)
    return (
        dup.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dup_chunks"),
            F.sum(F.when(F.col("is_dup"), F.col("n_chunk_tokens")).otherwise(0)).alias(
                "dup_tokens"
            ),
            F.round(
                F.sum(F.col("is_dup").cast("int")) * 100.0 / F.count(F.lit(1)), 2
            ).alias("pct_removed"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------

_BLOOM_M = 65536  # filter positions (8 KB of bits)
_BLOOM_K = 3  # probes per gram
_BLOOM_N = 8  # gram width


def _bloom_pos_sql(h: str, i: int) -> str:
    """Kirsch–Mitzenmacher double hashing: pos_i = (h1 + i*h2) mod m with
    h1/h2 carved from the one 60-bit gram hash — no per-probe rehash."""
    return (
        f"((({h}) % {_BLOOM_M}) + {i} * ((({h}) // {_BLOOM_M}) % {_BLOOM_M}))"
        f" % {_BLOOM_M}"
    )


def _bloom_decontamination_oracle() -> str:
    from syslog_kafka_spark.operators.curation import hash_split_sql, ngram_hashes_sql

    gram_expr, unnest = ngram_hashes_sql("toks", n=_BLOOM_N, salt="bloom-v1")
    pos_list = ", ".join(_bloom_pos_sql("gram_hash", i) for i in range(_BLOOM_K))
    return f"""
        WITH d AS (
          SELECT doc_id, {_TOKENS_SQL} AS toks,
                 {hash_split_sql('doc_id')} AS split
          FROM documents
        ), g AS (
          SELECT doc_id, split, {gram_expr} AS gram_hash
          FROM d, {unnest}
          WHERE len(toks) >= {_BLOOM_N} AND split != 'val'
        ), train_g AS (
          SELECT DISTINCT gram_hash FROM g WHERE split = 'train'
        ), train_pos AS (
          SELECT DISTINCT p AS pos FROM train_g, unnest([{pos_list}]) AS _p(p)
        ), test_g AS (
          SELECT DISTINCT doc_id, gram_hash FROM g WHERE split = 'test'
        ), test_pos AS (
          SELECT DISTINCT doc_id, gram_hash, p AS pos
          FROM test_g, unnest([{pos_list}]) AS _p(p)
        ), probes AS (
          SELECT t.doc_id, t.gram_hash,
                 count(*) AS n_pos,
                 sum(CASE WHEN train_pos.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
          FROM test_pos t LEFT JOIN train_pos USING (pos)
          GROUP BY t.doc_id, t.gram_hash
        ), verdicts AS (
          SELECT p.doc_id,
                 (p.n_hit = p.n_pos) AS bloom_hit,
                 (tg.gram_hash IS NOT NULL) AS exact_hit
          FROM probes p
          LEFT JOIN (SELECT gram_hash, 1 AS _m FROM train_g) tg
            ON p.gram_hash = tg.gram_hash
        )
        SELECT doc_id,
               count(*) AS n_test_grams,
               CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bloom_hits,
               CAST(sum(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_exact_hits,
               CAST(sum(CASE WHEN bloom_hit AND NOT exact_hit THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_false_pos,
               (sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) > 0) AS flagged
        FROM verdicts GROUP BY doc_id ORDER BY doc_id
    """


@query(
    "llm_bloom_decontamination",
    family="llm",
    oracle=_bloom_decontamination_oracle(),
)
def llm_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-memory decontamination: the train split's 8-gram hashes
    are folded into a 65536-position Bloom filter (3 Kirsch–Mitzenmacher
    probes per gram, both derived from the one 60-bit gram hash), and
    each held-out document is probed against it — with the exact-join
    verdict computed alongside so the result quantifies the filter's
    false-positive cost against ground truth.

    Why this exists next to llm_decontamination: the exact recipe must
    materialize/broadcast the distinct train gram set, which at 100 TB
    is tens of GB per executor; the Bloom side is ≤65536 distinct
    positions (~8 KB of bits) REGARDLESS of corpus size — built with one
    distinct-aggregate over hashed grams, broadcast to every probe task.
    The m/k here are sized for the test corpus; a production run scales
    m with the gram cardinality estimate and keeps everything else.

    Distributed shape: one tokenize+hash pass feeds both splits behind a
    cache barrier; the filter build is a map-side-combinable distinct of
    bounded cardinality; the probe is a broadcast hash join against the
    ≤m-row position set — the train corpus is never shuffled."""
    from syslog_kafka_spark.operators.curation import hash_split, ngram_hashes

    m, k = _BLOOM_M, _BLOOM_K
    d = load_tables(spark, sf_dir).documents
    labeled = d.select("doc_id", "text", hash_split("doc_id").alias("split")).filter(
        F.col("split") != "val"
    )
    grams = ngram_hashes(labeled, n=_BLOOM_N, salt="bloom-v1", carry=("split",)).cache()
    h = F.col("gram_hash")
    h1 = F.pmod(h, F.lit(m))
    h2 = F.pmod(F.expr(f"gram_hash div {m}"), F.lit(m))
    pos_arr = F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)])

    train_g = grams.filter(F.col("split") == "train").select("gram_hash").distinct()
    train_pos = train_g.select(F.explode(pos_arr).alias("pos")).distinct()
    test_g = (
        grams.filter(F.col("split") == "test").select("doc_id", "gram_hash").distinct()
    )
    test_pos = test_g.select(
        "doc_id", "gram_hash", F.explode(pos_arr).alias("pos")
    ).distinct()

    probes = (
        test_pos.join(
            F.broadcast(train_pos.withColumn("_hit", F.lit(1))), "pos", "left"
        )
        .groupBy("doc_id", "gram_hash")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hit"),
        )
    )
    # Ground-truth exact hits, decontamination-shaped: the tiny held-out
    # gram set is broadcast INTO the train side (inner join), so the
    # train corpus is never shuffled and never broadcast.
    exact = (
        F.broadcast(test_g)
        .join(train_g, "gram_hash")
        .withColumn("_exact", F.lit(1))
    )
    verdicts = probes.join(
        F.broadcast(exact), ["doc_id", "gram_hash"], "left"
    ).select(
        "doc_id",
        (F.col("n_hit") == F.col("n_pos")).alias("bloom_hit"),
        F.col("_exact").isNotNull().alias("exact_hit"),
    )
    return (
        verdicts.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_test_grams"),
            F.sum(F.col("bloom_hit").cast("long")).alias("n_bloom_hits"),
            F.sum(F.col("exact_hit").cast("long")).alias("n_exact_hits"),
            F.sum((F.col("bloom_hit") & ~F.col("exact_hit")).cast("long")).alias(
                "n_false_pos"
            ),
            (F.sum(F.col("bloom_hit").cast("long")) > 0).alias("flagged"),
        )
        .orderBy("doc_id")
    )
