"""Portable hash expression builders.

Everything here is a pure Column expression (JVM-side, codegen'd, no UDFs)
built on md5 — the one hash primitive whose bytes agree across Spark,
DuckDB, and any other engine, which makes MinHash/fingerprint queries
oracle-checkable. Spark's builtin hash()/xxhash64 are engine-private.

hash64: first 15 hex digits of md5 → 60-bit non-negative BIGINT.
Spark:  CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def hash64(col: Column | str, salt: str = "") -> Column:
    """Deterministic 60-bit hash of a string column (md5-derived)."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    if salt:
        c = F.concat(c, F.lit(salt))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str, salt: str = "") -> str:
    """DuckDB twin of :func:`hash64` for oracle queries."""
    salted = f"({expr}) || '{salt}'" if salt else expr
    return f"(('0x' || substr(md5({salted}), 1, 15))::BIGINT)"


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-grams of a string as an array (short-string
    safe: strings under k chars yield their whole text as one shingle).

    Built as transform(sequence(...)) — fully codegen'd, no explode, so it
    composes inside aggregations without a row blowup.
    """
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(k))))


def char_shingles_sql(expr: str, k: int = 5) -> str:
    """DuckDB twin of :func:`char_shingles`."""
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(length({expr}) - {k - 1}, 1)), "
        f"i -> substr({expr}, i, {k})))"
    )


# MinHash hash family: one md5 per shingle, then n affine transforms
# h_i(x) = (a_i * x + b_i) mod P over the 31-bit base hash. P = 2^31 - 1
# keeps a_i * x < 2^62 — no int64 overflow, so DuckDB's checked arithmetic
# accepts the identical formula (16x fewer md5 calls than per-salt md5:
# measured 130s → ~4s on the sf0.1 minhash queries).
_MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)
_MINHASH_MASK = 0x7FFFFFFF


def _minhash_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs via a fixed Weyl-style recurrence
    (a must be non-zero mod P)."""
    coeffs = []
    for i in range(n_hashes):
        a = (2654435761 * (i + 1) + 0x9E3779B9) % _MINHASH_P or 1
        b = (40503 * (i + 7) * (i + 7) + 97) % _MINHASH_P
        coeffs.append((a, b))
    return coeffs


def minhash_signature(shingle_col: Column, n_hashes: int = 16) -> Column:
    """MinHash signature: array of n minima of affine-transformed shingle
    hashes — computed as ONE fold.

    Catalyst does not common-subexpression-eliminate across separate
    higher-order-function calls, so the naive "n x array_min(transform(
    hashes, ...))" shape re-hashes every shingle n times (measured 45s for
    5k docs at sf0.1). This shape hashes each shingle exactly once and
    keeps all n running minima in one aggregate accumulator: no shuffle,
    no UDF, one pass.
    """
    hashes = F.transform(
        shingle_col,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
        .cast("bigint")
        .bitwiseAND(F.lit(_MINHASH_MASK)),
    )
    coeffs = F.array(
        *[
            F.struct(F.lit(a).cast("bigint").alias("a"), F.lit(b).cast("bigint").alias("b"))
            for a, b in _minhash_coeffs(n_hashes)
        ]
    )
    init = F.array_repeat(F.lit(_MINHASH_P).cast("bigint"), n_hashes)
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc, coeffs, lambda m, c: F.least(m, F.pmod(h * c["a"] + c["b"], F.lit(_MINHASH_P)))
        ),
    )


def minhash_signature_sql(shingles_expr: str, n_hashes: int = 16) -> str:
    """DuckDB twin of :func:`minhash_signature`."""
    base = (
        f"list_transform({shingles_expr}, "
        f"s -> ((('0x' || substr(md5(s), 1, 15))::BIGINT) & {_MINHASH_MASK}))"
    )
    mins = [
        f"list_min(list_transform({base}, h -> (h * {a} + {b}) % {_MINHASH_P}))"
        for a, b in _minhash_coeffs(n_hashes)
    ]
    return "[" + ", ".join(mins) + "]"


def fnv1a32(col: Column | str) -> Column:
    """FNV-1a 32-bit hash of a string's UTF-8 bytes.

    Byte-level parity with the reference's default partitioner
    (/root/reference Godeps .../elodina/siesta-producer/partitioner.go:15-44):
    h = 2166136261; for each byte: h = (h XOR b) * 16777619 mod 2^32.
    Pure fold over the byte array — no UDF, exact uint32 wraparound.
    """
    c = F.col(col) if isinstance(col, str) else col
    b = c.cast("binary")
    idx = F.sequence(F.lit(1), F.length(b))
    byte_vals = F.when(F.length(b) == 0, F.expr("array()").cast("array<int>")).otherwise(
        F.transform(idx, lambda i: F.conv(F.hex(b.substr(i, F.lit(1))), 16, 10).cast("int"))
    )
    two32 = F.lit(4294967296).cast("bigint")
    return F.aggregate(
        byte_vals,
        F.lit(2166136261).cast("bigint"),
        lambda acc, byte: F.pmod(
            acc.bitwiseXOR(byte.cast("bigint")) * F.lit(16777619).cast("bigint"), two32
        ),
    )


def fnv1a32_partition(col: Column | str, num_partitions: int) -> Column:
    """Reference hash-partitioner parity: abs(fnv1a32(key)) % n
    (partitioner.go:27-44; the Go int32 cast can go negative, abs'd).

    Deliberate 1-in-2^32 divergence: for the single hash value
    0x80000000, Go's ``hash = -hash`` overflows int32 (-(-2^31) stays
    -2^31) and its ``%`` then yields a NEGATIVE partition — an
    unroutable index, arguably a reference bug. This implementation
    (and the DuckDB oracle in kafka_partitioner_histogram) instead
    produce abs() = 2147483648 and a valid partition. No key in any
    fixture or realistic corpus hits it, so the byte-parity claim holds
    for every other hash value; documented so the claim is precise.
    """
    h32 = fnv1a32(col)
    # Go casts the uint32 to int32 (may be negative), then takes abs.
    signed = F.when(h32 >= F.lit(2147483648), h32 - F.lit(4294967296)).otherwise(h32)
    return F.abs(signed) % F.lit(num_partitions)


def hashed_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct 60-bit hashes of the character k-grams — the compact
    representation the LSH pair join carries instead of shingle strings.

    8-byte ints shuffle ~2.5x smaller than short UTF8 strings and
    intersect with integer compares instead of string compares, which is
    what the verify stage over hundreds of thousands of candidate pairs
    is bound by. The 31-bit MinHash base equals ``hash & 0x7FFFFFFF`` of
    these values, so signatures (and therefore band buckets and candidate
    sets) are bit-identical to the string path. Collisions at 60 bits are
    ~1e-6 at 10M shingles AND identical across engines (same md5 family),
    so the hash gate stays exact."""
    sh = char_shingles(col, k)
    return F.array_distinct(
        F.transform(
            sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
        )
    )


def hashed_shingles_sql(expr: str, k: int = 5) -> str:
    """DuckDB twin of :func:`hashed_shingles`."""
    return (
        f"list_distinct(list_transform({char_shingles_sql(expr, k)}, "
        f"s -> (('0x' || substr(md5(s), 1, 15))::BIGINT)))"
    )


def minhash_signature_from_hashes(hash_col: Column, n_hashes: int = 16) -> Column:
    """:func:`minhash_signature` over pre-hashed shingles (see
    :func:`hashed_shingles`) — skips the md5 pass; the 31-bit base is the
    masked low bits of the 60-bit hash, identical to hashing the string."""
    hashes = F.transform(hash_col, lambda h: h.bitwiseAND(F.lit(_MINHASH_MASK)))
    coeffs = F.array(
        *[
            F.struct(F.lit(a).cast("bigint").alias("a"), F.lit(b).cast("bigint").alias("b"))
            for a, b in _minhash_coeffs(n_hashes)
        ]
    )
    init = F.array_repeat(F.lit(_MINHASH_P).cast("bigint"), n_hashes)
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc, coeffs, lambda m, c: F.least(m, F.pmod(h * c["a"] + c["b"], F.lit(_MINHASH_P)))
        ),
    )


def minhash_signature_from_hashes_sql(hashes_expr: str, n_hashes: int = 16) -> str:
    """DuckDB twin of :func:`minhash_signature_from_hashes`."""
    base = f"list_transform({hashes_expr}, h -> (h & {_MINHASH_MASK}))"
    mins = [
        f"list_min(list_transform({base}, h -> (h * {a} + {b}) % {_MINHASH_P}))"
        for a, b in _minhash_coeffs(n_hashes)
    ]
    return "[" + ", ".join(mins) + "]"
