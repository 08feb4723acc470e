"""Property-based cross-engine portability of the hash family.

Every hash-gated dedup/LSH/split query rests on one claim: the md5-derived
``hash64`` (and everything built on it — MinHash signatures, band buckets,
SimHash bits) computes the SAME value in Spark and DuckDB for ANY string.
These tests verify the claim on adversarial inputs (unicode, quotes,
whitespace, long strings), not just the fixture corpus.

Strings are batched per example set (one Spark job + one DuckDB query per
batch, not per string) to keep runtime sane.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from syslog_kafka_spark.functions.hashes import (
    hash64,
    hash64_sql,
    minhash_signature,
    minhash_signature_sql,
)

# printable-ish unicode without surrogates; includes quotes/backslashes
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
    min_size=0,
    max_size=200,
)


def _duck_hash64(strings: list[str], salt: str = "") -> list[int]:
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(strings)))
    rows = con.execute(
        f"SELECT i, {hash64_sql('s', salt=salt)} FROM t ORDER BY i"
    ).fetchall()
    return [r[1] for r in rows]


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20, unique=True))
def test_hash64_matches_duckdb_on_arbitrary_strings(spark, strings):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], ["i", "s"])
    got = {
        r.i: r.h
        for r in df.select("i", hash64(F.col("s"), salt="prop-v1").alias("h")).collect()
    }
    want = _duck_hash64(strings, salt="prop-v1")
    assert [got[i] for i in range(len(strings))] == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abcdef 123", min_size=0, max_size=60), min_size=1, max_size=8, unique=True))
def test_minhash_signature_matches_duckdb(spark, texts):
    """Full signature portability: shingle → base hash → affine family →
    per-slot minima, end to end on arbitrary short texts."""
    from syslog_kafka_spark.functions.hashes import char_shingles, char_shingles_sql

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r.i: r.sig
        for r in df.select(
            "i", minhash_signature(char_shingles(F.col("t"), 5), 16).alias("sig")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    rows = con.execute(
        "SELECT i, "
        + minhash_signature_sql(char_shingles_sql("t", 5), 16)
        + " FROM t ORDER BY i"
    ).fetchall()
    for i, sig in rows:
        assert got[i] == sig, f"signature diverged for {texts[i]!r}"


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abcdef 123", min_size=0, max_size=60), min_size=1, max_size=8, unique=True))
def test_hashed_shingles_and_signature_match_duckdb(spark, texts):
    """The hashed-shingle LSH path (the one the pair join now carries):
    shingle → 60-bit hash set AND signature-from-hashes must both be
    byte-identical cross-engine, and the signature must equal the
    string-path signature (the masked-low-bits equivalence)."""
    from syslog_kafka_spark.functions.hashes import (
        char_shingles,
        char_shingles_sql,
        hashed_shingles,
        hashed_shingles_sql,
        minhash_signature_from_hashes,
        minhash_signature_from_hashes_sql,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r.i: (sorted(r.hs), r.sig, r.sig_str)
        for r in df.select(
            "i",
            hashed_shingles(F.col("t"), 5).alias("hs"),
            minhash_signature_from_hashes(hashed_shingles(F.col("t"), 5), 16).alias("sig"),
            minhash_signature(char_shingles(F.col("t"), 5), 16).alias("sig_str"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    rows = con.execute(
        "SELECT i, "
        + hashed_shingles_sql("t", 5)
        + ", "
        + minhash_signature_from_hashes_sql(hashed_shingles_sql("t", 5), 16)
        + " FROM t ORDER BY i"
    ).fetchall()
    for i, hs, sig in rows:
        g_hs, g_sig, g_sig_str = got[i]
        assert sorted(hs) == g_hs, f"hashed shingles diverged for {texts[i]!r}"
        assert list(sig) == list(g_sig), f"signature diverged for {texts[i]!r}"
        assert list(g_sig) == list(g_sig_str), f"hash-path signature != string-path for {texts[i]!r}"
