"""Curation-operator semantics: PII scrubbing, split stability,
chunk coverage, bucket edges (operators/curation.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from syslog_kafka_spark.operators.curation import (
    chunk_tokens,
    hash_split,
    length_bucket,
    pii_counts,
    redact_pii,
)


def test_redact_pii_scrubs_all_categories(spark):
    rows = [
        (1, "mail me at jane.doe+x@corp.example.org today"),
        (2, "server 192.168.0.17 answered; backup at 10.0.0.1"),
        (3, "call +1 555 0100 99 now"),
        (4, "clean text with no pii at all"),
        (5, "combo a@b.co from 8.8.8.8 dial +44 20 7946 0958"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = df.select(
        "id",
        redact_pii("t").alias("red"),
        *[e.alias(k) for k, e in pii_counts("t").items()],
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert "<EMAIL>" in by_id[1]["red"] and "@" not in by_id[1]["red"]
    assert by_id[2]["red"].count("<IP>") == 2
    assert "<PHONE>" in by_id[3]["red"]
    assert by_id[4]["red"] == "clean text with no pii at all"
    assert (
        "<EMAIL>" in by_id[5]["red"]
        and "<IP>" in by_id[5]["red"]
        and "<PHONE>" in by_id[5]["red"]
    )
    assert (by_id[5]["n_email"], by_id[5]["n_ipv4"], by_id[5]["n_phone"]) == (1, 1, 1)


def test_hash_split_is_stable_and_roughly_proportional(spark):
    df = spark.range(5000).select(F.col("id"))
    split = df.select("id", hash_split("id").alias("s"))
    counts = {r["s"]: r["cnt"] for r in split.groupBy("s").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.80) < 0.03
    assert abs(counts["val"] / 5000 - 0.10) < 0.03
    # determinism: recomputing (and repartitioning) never moves a row
    again = df.repartition(13).select("id", hash_split("id").alias("s"))
    assert split.exceptAll(again).count() == 0
    # a different salt produces a different (but still valid) assignment
    other = df.select("id", hash_split("id", salt="split-v2").alias("s"))
    assert split.exceptAll(other).count() > 0


def test_chunk_tokens_coverage_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame([(1, text), (2, "short doc"), (3, "")], ["doc_id", "text"])
    chunks = chunk_tokens(df, chunk_size=64, stride=48).collect()
    d1 = sorted([r for r in chunks if r["doc_id"] == 1], key=lambda r: r["chunk_start"])
    # starts at 1, 49, 97 — every token covered, windows overlap by 16
    assert [r["chunk_start"] for r in d1] == [1, 49, 97]
    assert [r["n_chunk_tokens"] for r in d1] == [64, 52, 4]
    assert d1[0]["chunk_text"].split(" ")[0] == "w0"
    assert d1[1]["chunk_text"].split(" ")[0] == "w48"  # overlap region
    covered = set()
    for r in d1:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"w{i}" for i in range(100)}
    # short docs give one whole-doc chunk; empty docs one empty chunk
    d2 = [r for r in chunks if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "short doc"
    d3 = [r for r in chunks if r["doc_id"] == 3]
    assert len(d3) == 1 and d3[0]["n_chunk_tokens"] == 0


def test_length_bucket_edges(spark):
    df = spark.createDataFrame(
        [(0,), (15,), (16,), (63,), (64,), (511,), (512,), (10000,)], ["n"]
    )
    got = {r["n"]: r["b"] for r in df.select("n", length_bucket("n").alias("b")).collect()}
    assert got == {0: 0, 15: 0, 16: 16, 63: 32, 64: 64, 511: 256, 512: 512, 10000: 512}


def test_ngram_hashes_count_and_planted_overlap(spark):
    from syslog_kafka_spark.operators.curation import ngram_hashes

    shared = "alpha beta gamma delta epsilon"  # 5 tokens -> one shared 5-gram
    rows = [
        (1, f"intro words {shared} trailing bits here"),
        (2, f"other doc starts {shared} and then diverges"),
        (3, "completely unrelated text with no overlap at all"),
        (4, "tiny"),  # shorter than n -> emits nothing
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    g = ngram_hashes(df, n=5, salt="t")
    per_doc = {
        r["doc_id"]: r["cnt"]
        for r in g.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
    }
    # doc 1 has 10 tokens -> 6 grams; doc 2 has 11 -> 7; doc 3 has 8 -> 4
    assert per_doc == {1: 6, 2: 7, 3: 4}
    overlap = (
        g.filter(F.col("doc_id") == 1)
        .select("gram_hash")
        .intersect(g.filter(F.col("doc_id") == 2).select("gram_hash"))
        .count()
    )
    assert overlap == 1  # exactly the planted shared 5-gram
    assert (
        g.filter(F.col("doc_id") == 1)
        .select("gram_hash")
        .intersect(g.filter(F.col("doc_id") == 3).select("gram_hash"))
        .count()
        == 0
    )


def test_pack_bins_offsets_and_boundary_crossing(spark):
    from syslog_kafka_spark.operators.curation import pack_bins

    # Single shard (n_shards=1) makes the concat order fully determined
    # by doc_id: offsets 0,3,7 with context_len 8 -> doc 30 crosses.
    rows = [
        (10, "a b c"),  # 3 tokens, first_token 0, bin 0
        (20, "d e f g"),  # 4 tokens, first_token 3, bin 0, ends at 6
        (30, "h i j k"),  # first_token 7, bin 0, ends at 10 -> crosses
        (40, "l m"),  # first_token 11, bin 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in pack_bins(df, context_len=8, n_shards=1).collect()
    }
    assert [out[i]["first_token"] for i in (10, 20, 30, 40)] == [0, 3, 7, 11]
    assert [out[i]["bin"] for i in (10, 20, 30, 40)] == [0, 0, 0, 1]
    assert [out[i]["crosses_boundary"] for i in (10, 20, 30, 40)] == [
        False,
        False,
        True,
        False,
    ]
