"""Corpus-statistics mining: Zipf rank-frequency slope, PMI collocations,
bigram language-model scoring.

Training-data curation needs corpus-level statistical profiles beyond
per-doc quality gates (SURVEY §2B.10): a Zipf slope sanity-checks that a
crawl slice has natural-language token statistics (templated/boilerplate
corpora flatten the curve), PMI collocations surface the phrases a
tokenizer should keep intact, and bigram-LM perplexity is the classic
fluency filter (CCNet uses a 5-gram LM; the bigram variant here has the
same dataflow shape — per-doc probe against broadcast corpus counts —
with exactly reproducible arithmetic for the oracle).

All three are single-scan + hash-agg pipelines over the shared token
array: no UDFs, no driver-side state, every aggregate keyed by token or
doc_id — the shapes that scale to a 100 TB corpus unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from syslog_kafka_spark.functions.text import tokens
from syslog_kafka_spark.plans.registry import query
from syslog_kafka_spark.sources.readers import load_tables, spread

_TOKENS_SQL = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t != '')"

# Shared Spark-side bigram builder: index-transform over the token array
# (no explode until the final aggregation; see llm_word_bigrams for the
# CSE rationale behind materializing tokens first).
def _bigrams_col():
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_toks") - 1, F.lit(0))),
        lambda i: F.concat(
            F.element_at("_toks", i), F.lit(" "), F.element_at("_toks", i + 1)
        ),
    )


_BIGRAMS_SQL = """
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                        i -> t[i] || ' ' || t[i + 1])) AS bigram
          FROM (SELECT doc_id, {toks} AS t FROM documents)
""".format(toks=_TOKENS_SQL)


@query(
    "llm_zipf_slope",
    family="llm",
    oracle=f"""
        WITH tok AS (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents),
        freq AS (SELECT tok, count(*) AS freq FROM tok GROUP BY tok),
        top AS (
          SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank
          FROM freq ORDER BY freq DESC, tok LIMIT 500
        )
        SELECT
          count(*) AS n_ranks,
          CAST(round(regr_slope(ln(freq), ln(rank)), 6) AS DOUBLE) AS zipf_slope,
          CAST(round(regr_intercept(ln(freq), ln(rank)), 6) AS DOUBLE) AS zipf_intercept
        FROM top
    """,
)
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(freq) on ln(rank) over the top-500
    token ranks. Natural-language corpora land near -1; far-off slopes
    flag boilerplate or templating in a crawl slice.

    Scale shape: one explode + hash-agg for the frequency table, then
    TakeOrderedAndProject for the top-k (never a full sort), then the
    rank window runs on 500 rows — a single partition by construction,
    not by accident of data size."""
    d = load_tables(spark, sf_dir).documents
    freq = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    top = freq.orderBy(F.desc("freq"), F.asc("tok")).limit(500)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("tok")))
    )
    return ranked.agg(
        F.count("*").alias("n_ranks"),
        F.round(F.regr_slope(F.log("freq"), F.log("rank")), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(F.log("freq"), F.log("rank")), 6).alias(
            "zipf_intercept"
        ),
    )


@query(
    "llm_pmi_collocations",
    family="llm",
    oracle=f"""
        WITH tok AS (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents),
        uni AS (SELECT tok, count(*) AS c1 FROM tok GROUP BY tok),
        nu AS (SELECT sum(c1) AS n_uni FROM uni),
        big AS (
          SELECT bigram, count(*) AS c12
          FROM ({_BIGRAMS_SQL})
          GROUP BY bigram HAVING count(*) >= 5
        ),
        nb AS (
          SELECT sum(cnt) AS n_big FROM (
            SELECT count(*) AS cnt FROM ({_BIGRAMS_SQL}) GROUP BY bigram
          )
        )
        SELECT
          b.bigram AS bigram,
          b.c12 AS freq,
          CAST(round(ln((CAST(b.c12 AS DOUBLE) / n_big) /
                 ((CAST(u1.c1 AS DOUBLE) / n_uni) * (CAST(u2.c1 AS DOUBLE) / n_uni))), 4)
               AS DOUBLE) AS pmi
        FROM big b
        JOIN uni u1 ON u1.tok = split_part(b.bigram, ' ', 1)
        JOIN uni u2 ON u2.tok = split_part(b.bigram, ' ', 2)
        CROSS JOIN nu CROSS JOIN nb
        ORDER BY pmi DESC, bigram
        LIMIT 20
    """,
)
def llm_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information (min bigram
    freq 5): PMI = ln(p(w1,w2) / (p(w1) p(w2))), the classic phrase-mining
    statistic for deciding which multi-word units a tokenizer vocabulary
    should keep whole.

    The division chain is written identically on both engines (IEEE ops
    in the same order → bit-identical before rounding). Unigram and
    bigram counts are hash-aggs on the token; the two vocab joins key on
    single words — all shuffles are on token strings, never on doc pairs."""
    d = load_tables(spark, sf_dir).documents
    # spread: the base is consumed by several aggregations; on a
    # single-split scan each re-execution of the tokenize+explode would
    # otherwise run one-core (sources/readers.spread).
    base = spread(d.select("doc_id", tokens("text").alias("_toks")))
    uni = (
        base.select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    n_uni = uni.agg(F.sum("c1").alias("n_uni"))
    all_big = base.select(F.explode(_bigrams_col()).alias("bigram"))
    big_counts = all_big.groupBy("bigram").agg(F.count("*").alias("c12"))
    n_big = big_counts.agg(F.sum("c12").alias("n_big"))
    big = big_counts.filter(F.col("c12") >= 5)
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c1").alias("c1_w1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c1").alias("c1_w2"))
    joined = (
        big.withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
    )
    pmi = F.round(
        F.log(
            (F.col("c12").cast("double") / F.col("n_big"))
            / (
                (F.col("c1_w1").cast("double") / F.col("n_uni"))
                * (F.col("c1_w2").cast("double") / F.col("n_uni"))
            )
        ),
        4,
    )
    return (
        joined.select(
            "bigram", F.col("c12").alias("freq"), pmi.alias("pmi")
        )
        .orderBy(F.desc("pmi"), "bigram")
        .limit(20)
    )


@query(
    "llm_bigram_logprob",
    family="llm",
    oracle=f"""
        WITH doc_big AS (
          SELECT doc_id, bigram, split_part(bigram, ' ', 1) AS w1
          FROM ({_BIGRAMS_SQL})
        ),
        c12 AS (SELECT bigram, count(*) AS c12 FROM doc_big GROUP BY bigram),
        c1 AS (SELECT w1, count(*) AS c1 FROM doc_big GROUP BY w1)
        SELECT
          d.doc_id AS doc_id,
          count(*) AS n_bigrams,
          CAST(round(avg(-ln(CAST(c12.c12 AS DOUBLE) / c1.c1)), 4) AS DOUBLE)
            AS mean_nll
        FROM doc_big d
        JOIN c12 ON c12.bigram = d.bigram
        JOIN c1 ON c1.w1 = d.w1
        GROUP BY d.doc_id
        ORDER BY d.doc_id
        LIMIT 100
    """,
)
def llm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean bigram negative log-likelihood under the corpus
    bigram LM (p(w2|w1) = c(w1 w2) / c(w1 ·), MLE over observed bigram
    heads — no smoothing needed since every probe bigram is in the
    corpus by construction). The CCNet fluency-filter dataflow at bigram
    order: corpus counts once, broadcast-joined back to each document's
    bigrams, one hash-agg per doc.

    Output bounded to the first 100 doc_ids (TakeOrdered) so the gate
    hashes a fixed slice while the LM statistics still cover the whole
    corpus."""
    d = load_tables(spark, sf_dir).documents
    # spread: doc_big is consumed three times (c12, c1, scoring join) —
    # parallelize the re-executed tokenize+explode (sources/readers.spread).
    base = spread(d.select("doc_id", tokens("text").alias("_toks")))
    doc_big = base.select("doc_id", F.explode(_bigrams_col()).alias("bigram")).withColumn(
        "w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
    )
    c12 = doc_big.groupBy("bigram").agg(F.count("*").alias("c12"))
    c1 = doc_big.groupBy("w1").agg(F.count("*").alias("c1"))
    joined = doc_big.join(c12, "bigram").join(c1, "w1")
    nll = -F.log(F.col("c12").cast("double") / F.col("c1"))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("mean_nll"),
        )
        .orderBy("doc_id")
        .limit(100)
    )
