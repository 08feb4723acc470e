"""Curation quality-assurance operators: the audits a 100 TB pipeline
runs ON its own curation machinery — substring-level (span) dedup and
its removal plan, sketch calibration (MinHash estimate vs exact
Jaccard), corpus novelty drift, frozen-PQ compression error, and the
embedding covariance audit.

The theme distinguishing this module from plans/llm.py (the operators)
and plans/llm_scale.py (the constant-memory scale variants): every
query here measures the ERROR or DRIFT of another operator — the QA
layer that decides whether a sketch's parameters, a quantizer's
codebooks, or a dedup threshold still hold as the corpus grows. All
pure Column expressions or frozen-literal kernels over the house
md5-derived ``hash64``, so each is DuckDB-oracle-checkable.

Reference scope: engine addition (SURVEY §2B.10); the reference is an
ingest transport with no curation surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from syslog_kafka_spark.functions.hashes import hash64, hash64_sql
from syslog_kafka_spark.functions.text import tokens
from syslog_kafka_spark.operators.curation import ngram_hashes, ngram_hashes_sql
from syslog_kafka_spark.plans.registry import query
from syslog_kafka_spark.sources.readers import load_tables

_TOKENS_SQL = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t != '')"

# ---------------------------------------------------------------------------
# Repeated-span removal plan (substring-level exact dedup, Lee et al. 2022)
# ---------------------------------------------------------------------------

_SPAN_N = 8  # span width in tokens (matches the Bloom decontamination gram)


def _span_removal_oracle() -> str:
    expr, unnest = ngram_hashes_sql("toks", n=_SPAN_N, salt="span-v1")
    return f"""
        WITH d AS (
          SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
        ), g AS (
          SELECT doc_id, s AS pos, {expr} AS gram_hash
          FROM d, {unnest}
          WHERE len(toks) >= {_SPAN_N}
        ), r AS (
          SELECT doc_id,
                 row_number() OVER (
                   PARTITION BY gram_hash ORDER BY doc_id, pos
                 ) AS rn
          FROM g
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_removable,
               ROUND(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
                 AS removable_rate
        FROM r GROUP BY doc_id ORDER BY doc_id
    """


@query("llm_repeated_span_removal", family="llm", oracle=_span_removal_oracle())
def llm_repeated_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup (the ExactSubstr recipe of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    every 8-token span in the corpus is hashed, and every occurrence
    after the FIRST (ordered by doc_id, then position — within-doc
    repetition counts too) is marked removable. Document-level dedup
    cannot see this: boilerplate headers, licence blocks, and quoted
    passages repeat across otherwise-unique documents, and at 100 TB
    they are a double-digit share of tokens. The per-document removal
    plan (span count, removable count, rate) is what the chopper pass
    consumes.

    Distributed shape: only 8-byte span hashes explode and shuffle
    (never span text — ngram_hashes hashes inside the transform); the
    keep-first decision is one window over gram_hash, so the shuffle is
    linear in token count with fixed-width rows, no all-pairs stage. A
    full suffix-array build (the paper's exact method) orders the
    corpus globally; the fixed-width span grid is the
    shuffle-partitionable equivalent used by production rewrites."""
    d = load_tables(spark, sf_dir).documents
    toks_df = d.select("doc_id", tokens("text").alias("_toks")).filter(
        F.size("_toks") >= _SPAN_N
    )
    starts = F.sequence(F.lit(1), F.size("_toks") - F.lit(_SPAN_N - 1))
    grams = F.transform(
        starts,
        lambda s: hash64(F.array_join(F.slice("_toks", s, _SPAN_N), " "), salt="span-v1"),
    )
    g = toks_df.select(
        "doc_id", F.posexplode(grams).alias("pos", "gram_hash")
    )
    rn = F.row_number().over(
        Window.partitionBy("gram_hash").orderBy("doc_id", "pos")
    )
    r = g.select("doc_id", (rn > 1).cast("long").alias("removable"))
    return (
        r.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum("removable").cast("bigint").alias("n_removable"),
            F.round(F.sum("removable") / F.count(F.lit(1)), 6).alias(
                "removable_rate"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# n-gram novelty curve (corpus redundancy drift)
# ---------------------------------------------------------------------------

_NOVELTY_N = 3
_NOVELTY_DECILES = 10


def _novelty_oracle() -> str:
    expr, unnest = ngram_hashes_sql("toks", n=_NOVELTY_N, salt="novel-v1")
    return f"""
        WITH d AS (
          SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
        ), g AS (
          SELECT DISTINCT doc_id, {expr} AS gram_hash
          FROM d, {unnest}
          WHERE len(toks) >= {_NOVELTY_N}
        ), f AS (
          SELECT doc_id,
                 CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY gram_hash)
                      THEN 1 ELSE 0 END AS novel
          FROM g
        ), p AS (
          SELECT doc_id, count(*) AS n_types, sum(novel) AS n_novel
          FROM f GROUP BY doc_id
        ), t AS (
          SELECT *, ntile({_NOVELTY_DECILES}) OVER (ORDER BY doc_id) AS decile
          FROM p
        )
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_types) AS BIGINT) AS total_types,
               CAST(sum(n_novel) AS BIGINT) AS novel_types,
               ROUND(sum(n_novel) * 1.0 / sum(n_types), 6) AS novelty_rate
        FROM t GROUP BY decile ORDER BY decile
    """


@query("llm_ngram_novelty_curve", family="llm", oracle=_novelty_oracle())
def llm_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty drift: for each document (in doc_id ingest order),
    the fraction of its distinct token trigrams whose FIRST corpus
    occurrence is that document, rolled up into ingest-order deciles.
    A healthy growing corpus holds a stable novelty rate; a collapsing
    curve means new data is recombination of old — the earliest signal
    that continued crawling is buying duplicates, before any dedup pass
    runs. This is the audit DoReMi/DSIR-style pipelines read before
    re-weighting a source.

    Distributed shape: distinct (doc, gram_hash) pairs shuffle once on
    the 8-byte hash; first-occurrence is a min window over gram_hash
    (no join-back — the flag is computed in the same pass); the decile
    assignment runs over the per-DOC aggregate (corpus-count rows, not
    token-count). Linear end to end."""
    d = load_tables(spark, sf_dir).documents
    g = ngram_hashes(d, n=_NOVELTY_N, salt="novel-v1").distinct()
    novel = (
        F.col("doc_id")
        == F.min("doc_id").over(Window.partitionBy("gram_hash"))
    ).cast("long")
    p = (
        g.select("doc_id", novel.alias("novel"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("novel").alias("n_novel"),
        )
    )
    t = p.withColumn(
        "decile", F.ntile(_NOVELTY_DECILES).over(Window.orderBy("doc_id"))
    )
    return (
        t.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_types").cast("bigint").alias("total_types"),
            F.sum("n_novel").cast("bigint").alias("novel_types"),
            F.round(F.sum("n_novel") / F.sum("n_types"), 6).alias("novelty_rate"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# MinHash → exact Jaccard calibration
# ---------------------------------------------------------------------------

_CAL_HASHES = 16
_CAL_BANDS = 4


def _calibration_oracle() -> str:
    from syslog_kafka_spark.functions.hashes import (
        hashed_shingles_sql,
        minhash_signature_from_hashes_sql,
    )

    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    rpb = _CAL_HASHES // _CAL_BANDS
    band_cases = " ".join(
        "WHEN {b} THEN {h}".format(
            b=b,
            h=hash64_sql(
                "concat_ws(',', "
                + ", ".join(f"sig[{b * rpb + i + 1}]" for i in range(rpb))
                + ")"
            ),
        )
        for b in range(_CAL_BANDS)
    )
    sig_match = (
        f"CAST(list_sum(list_transform(generate_series(1, {_CAL_HASHES}), "
        "i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)"
    )
    return f"""
        WITH sh AS (
          SELECT doc_id AS id, {hashed_shingles_sql(norm)} AS shingles
          FROM documents
        ), sg AS (
          SELECT id, shingles,
                 {minhash_signature_from_hashes_sql('shingles', _CAL_HASHES)} AS sig
          FROM sh
        ), banded AS (
          SELECT id, t.b AS band,
                 CASE t.b {band_cases} END AS bucket
          FROM sg, (SELECT unnest([{", ".join(str(b) for b in range(_CAL_BANDS))}]) AS b) t
        ), pairs AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
        ), m AS (
          SELECT p.id_a, p.id_b,
                 {sig_match} / {_CAL_HASHES} AS est,
                 CASE WHEN len(sa.shingles) + len(sb.shingles)
                           - len(list_intersect(sa.shingles, sb.shingles)) = 0
                      THEN CAST(1.0 AS DOUBLE)
                      ELSE CAST(len(list_intersect(sa.shingles, sb.shingles))
                                AS DOUBLE)
                           / (len(sa.shingles) + len(sb.shingles)
                              - len(list_intersect(sa.shingles, sb.shingles)))
                 END AS exact
          FROM pairs p
          JOIN sg sa ON sa.id = p.id_a
          JOIN sg sb ON sb.id = p.id_b
        )
        SELECT least(CAST(floor(round(exact, 6) * 10) AS BIGINT), 9) AS bucket,
               CAST(count(*) AS BIGINT) AS n_pairs,
               ROUND(avg(est), 6) AS mean_est_jaccard,
               ROUND(avg(exact), 6) AS mean_exact_jaccard,
               ROUND(avg(abs(est - exact)), 6) AS mean_abs_err,
               ROUND(max(abs(est - exact)), 6) AS max_abs_err
        FROM m GROUP BY 1 ORDER BY bucket
    """


@query("llm_minhash_jaccard_calibration", family="llm", oracle=_calibration_oracle())
def llm_minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration audit: over the LSH candidate pairs, the
    signature-estimated Jaccard (matching components / 16) against the
    exact shingle Jaccard, bucketed by exact-similarity decile. This is
    how a pipeline decides whether 16 hashes are ENOUGH before a 100 TB
    dedup run: the per-bucket mean/max estimation error is exactly the
    error the banding threshold inherits, and a drifting corpus (longer
    docs, new shingle distribution) shows up here as widening error
    long before dedup recall visibly degrades.

    Distributed shape: identical candidate generation to the production
    dedup (banded, bucket join, ids-only shuffle, arrays joined back
    post-dedup from the shared cached base — zero extra scans); the
    estimate is a 16-component zip over arrays already in the rows.
    Per-pair est/exact/|err| are bit-identical cross-engine (single fp
    ops on identical integers); only the bucket MEANS are
    accumulation-order-sensitive, so they report at 6 dp. The decile
    key follows the pinned-threshold rule: floor(round(exact, 6) × 10).
    """
    from syslog_kafka_spark.operators.dedup import lsh_candidate_pairs

    d = load_tables(spark, sf_dir).documents
    pairs = lsh_candidate_pairs(
        d, k=5, n_hashes=_CAL_HASHES, bands=_CAL_BANDS, with_signatures=True
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    est = matches.cast("double") / F.lit(float(_CAL_HASHES))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - inter
    exact = F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
    m = pairs.select(est.alias("est"), exact.alias("exact"))
    bucket = F.least(
        F.floor(F.round(F.col("exact"), 6) * 10).cast("bigint"), F.lit(9)
    )
    err = F.abs(F.col("est") - F.col("exact"))
    return (
        m.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.avg("est"), 6).alias("mean_est_jaccard"),
            F.round(F.avg("exact"), 6).alias("mean_exact_jaccard"),
            F.round(F.avg(err), 6).alias("mean_abs_err"),
            F.round(F.max(err), 6).alias("max_abs_err"),
        )
        .orderBy("bucket")
    )
