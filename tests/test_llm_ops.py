"""Unit tests for LLM operators beyond the oracle gate: recall of the
approximate paths vs exact baselines, dedup survivor semantics, and
reference-parity of the FNV-1a partitioner."""

from __future__ import annotations

import pyspark.sql.functions as F

from syslog_kafka_spark.functions.hashes import fnv1a32, fnv1a32_partition
from syslog_kafka_spark.operators.dedup import exact_dedup, minhash_lsh_pairs, simhash64
from syslog_kafka_spark.operators.similarity import cosine_topk
from syslog_kafka_spark.sources.readers import load_tables


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "unrelated")],
        ["doc_id", "text"],
    )
    out = exact_dedup(df).select("doc_id").orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 3]


def test_minhash_lsh_finds_neardups_without_full_scan(spark, sf_dir):
    d = load_tables(spark, sf_dir).documents
    pairs = minhash_lsh_pairs(d, verify_threshold=0.5).collect()
    # near-dup pairs exist in the corpus and every returned pair is verified
    assert all(p.jaccard >= 0.5 for p in pairs)
    assert all(p.id_a < p.id_b for p in pairs)


def test_simhash_close_for_neardups(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy cat again and again"),
            (3, "completely different content about spark query engines at scale"),
        ],
        ["doc_id", "text"],
    )
    sims = {r.doc_id: r.simhash for r in simhash64(df).collect()}
    ham_close = bin(sims[1] ^ sims[2]).count("1")
    ham_far = bin(sims[1] ^ sims[3]).count("1")
    assert ham_close < ham_far


def test_frozen_ann_recall_vs_bruteforce(spark, sf_dir):
    """The hash-gated frozen-structure ANN paths must also stay GOOD
    retrievers: the gate pins their exact output, this pins their
    quality floor vs brute force (frozen planes/centroids could drift
    to uselessness while still hashing consistently)."""
    from syslog_kafka_spark.operators.ann_frozen import IVF_CENTROIDS, SRP_PLANES
    from syslog_kafka_spark.operators.similarity import ivf_topk_frozen, srp_topk_frozen

    emb = load_tables(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    exact_scores = {(r.query_id, r.neighbor_id): r.score for r in exact}
    srp = srp_topk_frozen(emb, queries, SRP_PLANES, k=5).collect()
    ivf = ivf_topk_frozen(emb, queries, IVF_CENTROIDS, k=5, n_probe=4).collect()
    srp_set = {(r.query_id, r.neighbor_id) for r in srp}
    ivf_set = {(r.query_id, r.neighbor_id) for r in ivf}
    # Random (near-orthogonal) vectors are the worst case for both
    # structures; measured srp=0.68/ivf=0.46 at sf0.001.
    assert len(srp_set & exact_set) / len(exact_set) >= 0.5, "frozen SRP recall collapsed"
    assert len(ivf_set & exact_set) / len(exact_set) >= 0.4, "frozen IVF recall collapsed"
    # scores the approximate paths do return are exact cosines (same
    # prenormed formula as the brute force)
    for r in [*srp, *ivf]:
        want = exact_scores.get((r.query_id, r.neighbor_id))
        if want is not None:
            assert abs(r.score - want) < 1e-9


def test_fnv1a32_reference_parity(spark):
    # FNV-1a test vectors (public: RFC draft / reference implementations)
    vectors = {"": 2166136261, "a": 0xE40C292C, "foobar": 0xBF9CF968}
    df = spark.createDataFrame([(s,) for s in vectors], ["s"])
    got = {r.s: r.h for r in df.select("s", fnv1a32("s").alias("h")).collect()}
    for s, want in vectors.items():
        assert got[s] == want, f"fnv1a32({s!r}) = {got[s]}, want {want}"


def test_fnv1a32_partition_in_range(spark):
    df = spark.createDataFrame([(f"key-{i}",) for i in range(100)], ["s"])
    parts = df.select(fnv1a32_partition("s", 7).alias("p")).collect()
    assert all(0 <= r.p < 7 for r in parts)


def test_asof_join_matches_rank_semantics(spark):
    from syslog_kafka_spark.operators.asof import asof_join_last

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 200), (3, 20, 150)], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [(101, 10, 100), (102, 10, 150), (103, 20, 200)], ["rid", "k", "ts"]
    )
    out = {
        r.id: r.val
        for r in asof_join_last(
            left, right, on="k", left_ts="ts", right_ts="ts", right_value="rid", value_alias="val"
        ).collect()
    }
    assert out[1] == 101  # exact-ts match included
    assert out[2] == 102  # latest at-or-before
    assert out[3] is None  # right row is after the left ts


def test_asof_join_next_matches_rank_semantics(spark):
    from syslog_kafka_spark.operators.asof import asof_join_next

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 160), (3, 20, 150)], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [(101, 10, 100), (102, 10, 150), (103, 20, 120)], ["rid", "k", "ts"]
    )
    out = {
        r.id: r.val
        for r in asof_join_next(
            left, right, on="k", left_ts="ts", right_ts="ts", right_value="rid", value_alias="val"
        ).collect()
    }
    assert out[1] == 101  # exact-ts match included (at-or-after)
    assert out[2] is None  # no right row at-or-after ts=160
    assert out[3] is None  # right row precedes the left ts


def test_asof_join_next_tie_takes_smallest_value(spark):
    from syslog_kafka_spark.operators.asof import asof_join_next

    left = spark.createDataFrame([(1, 10, 100)], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(105, 10, 100), (103, 10, 100), (104, 10, 100)], ["rid", "k", "ts"]
    )
    out = asof_join_next(
        left, right, on="k", left_ts="ts", right_ts="ts", right_value="rid", value_alias="val"
    ).collect()
    assert out[0].val == 103  # ties at equal ts resolve to the smallest value


def test_asof_tolerance_skips_null_valued_right_rows(spark):
    """Under tolerance, a null-valued right row must be skipped (fall back
    to the previous non-null row) exactly as last(_v, ignorenulls) does in
    the non-tolerance branch — and the tolerance bound must then check the
    TIMESTAMP OF THE ROW THAT SUPPLIED THE VALUE, not the fresher null one."""
    from datetime import datetime

    from syslog_kafka_spark.operators.asof import asof_join_last

    t = lambda s: datetime.fromisoformat(f"2024-01-01 00:{s}:00")
    left = spark.createDataFrame([(1, 10, t("10"))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(100, 10, t("00")), (None, 10, t("09"))],
        "rid INT, k INT, ts TIMESTAMP",
    )
    no_tol = asof_join_last(
        left, right, on="k", left_ts="ts", right_ts="ts", right_value="rid", value_alias="val"
    ).collect()[0]
    assert no_tol.val == 100  # ignorenulls falls back past the null row

    # 15-min tolerance: the matched (non-null) row is 10 min old → in bound
    wide = asof_join_last(
        left, right, on="k", left_ts="ts", right_ts="ts", right_value="rid",
        value_alias="val", tolerance_sec=15 * 60,
    ).collect()[0]
    assert wide.val == 100

    # 5-min tolerance: the null row at 09:00 is within bound but carries no
    # value; the non-null row at 00:00 is out of bound → null result
    narrow = asof_join_last(
        left, right, on="k", left_ts="ts", right_ts="ts", right_value="rid",
        value_alias="val", tolerance_sec=5 * 60,
    ).collect()[0]
    assert narrow.val is None


def test_pair_block_key_bounds_boilerplate_buckets(spark):
    """De-skew regression: on a corpus where EVERY doc shares the same
    32-char prefix (web boilerplate), pure prefix blocking puts all n docs
    in one bucket (n^2/2 pairs); the compound (prefix, length-bucket) key
    splits them so the worst bucket stays bounded."""
    from syslog_kafka_spark.plans.llm import with_pair_block_key

    boiler = "get /index.html http/1.1 host: example.com agent "  # > 32 chars
    rows = [(i, boiler + "x" * (i * 7)) for i in range(120)]  # varied lengths
    df = spark.createDataFrame(rows, ["doc_id", "norm"])

    blocked = with_pair_block_key(df, "norm")
    sizes = blocked.groupBy("blk_prefix", "blk_len").count().collect()
    assert sum(r["count"] for r in sizes) == 120
    # pure prefix would be one bucket of 120; the length bucket splits it
    assert len(sizes) > 10
    assert max(r["count"] for r in sizes) <= 10

    # docs with near-identical length (true near-dup shape) stay together
    pair = spark.createDataFrame(
        [(0, boiler + "tail one"), (1, boiler + "tail two")], ["doc_id", "norm"]
    )
    keys = with_pair_block_key(pair, "norm").select("blk_prefix", "blk_len").distinct()
    assert keys.count() == 1


def test_repetition_filter_flags_degenerate_docs(spark, sf_dir):
    """A maximally repetitive doc must fail both Gopher-style gates; a
    diverse doc must pass. Exercises the gated query end-to-end via a
    temp-view override of the documents table."""
    from syslog_kafka_spark.plans.registry import load_all

    rows = spark.sql(
        "SELECT * FROM (VALUES "
        "(0, 'spam spam spam spam spam spam spam spam', 'en', 'synth', 39), "
        "(1, 'one two three four five six seven eight', 'en', 'synth', 39)"
        ") AS t(doc_id, text, lang, source, n_chars)"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        rows.coalesce(1).write.parquet(f"{d}/documents.parquet")
        for name in ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "events", "embeddings"):
            os.symlink(f"{sf_dir}/{name}.parquet", f"{d}/{name}.parquet")
        out = {
            r.doc_id: r
            for r in load_all()["llm_quality_repetition"].build(spark, d).collect()
        }
    assert out[0].top_token_frac == 1.0 and out[0].dup_bigram_frac == 1.0
    assert out[0].keep is False
    assert out[1].top_token_frac < 0.18 and out[1].dup_bigram_frac == 0.0
    assert out[1].keep is True


def test_chunk_dedup_finds_planted_duplicate(spark):
    """Two docs sharing an 8-token run must surface exactly that chunk;
    unshared text must not pair."""
    from syslog_kafka_spark.functions.hashes import hash64
    from syslog_kafka_spark.operators.curation import chunk_tokens

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, shared + " unique one two three four five six"),
            (2, shared + " other seven eight nine ten eleven twelve"),
            (3, "totally different words without any overlap at all"),
        ],
        ["doc_id", "text"],
    )
    ch = chunk_tokens(df, chunk_size=8, stride=8).filter(F.col("n_chunk_tokens") == 8)
    dups = (
        ch.select("doc_id", hash64(F.col("chunk_text"), salt="chunk-v1").alias("h"))
        .groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .collect()
    )
    assert len(dups) == 1 and dups[0].n_docs == 2


def test_unigram_logprob_orders_rare_docs_higher(spark, sf_dir):
    """Docs made of corpus-rare tokens must score a higher mean NLL than
    docs of corpus-common tokens (the filter's entire point)."""
    import os
    import tempfile

    from syslog_kafka_spark.plans.registry import load_all

    # 10 docs of common words dominate the unigram distribution; doc 99
    # is pure rare-token soup (each rare token appears exactly once)
    docs = [(i, "the quick brown fox jumps", "en", "synth", 25) for i in range(10)]
    docs.append((99, "xylem quasar obelisk fjord glyph", "en", "synth", 32))
    rows = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        rows.coalesce(1).write.parquet(f"{d}/documents.parquet")
        for name in ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "events", "embeddings"):
            os.symlink(f"{sf_dir}/{name}.parquet", f"{d}/{name}.parquet")
        out = {
            r.doc_id: r.avg_nll_bits
            for r in load_all()["llm_unigram_logprob"].build(spark, d).collect()
        }
    assert out[99] > out[0] + 3  # rare doc is decisively less likely
    assert all(v > 0 for v in out.values())


def test_simhash_multiprobe_recall_beats_single_table(spark):
    """Multi-table rotation blocking must recover (a superset of) the
    single-table pairs and approach exhaustive recall on a near-dup
    corpus; every reported pair must satisfy the hamming bound."""
    import random

    from syslog_kafka_spark.operators.dedup import (
        hamming64,
        simhash64,
        simhash_neardup_multiprobe,
        simhash_neardup_pairs,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(40):
        base = [rng.choice(vocab) for _ in range(30)]
        variant = list(base)
        variant[rng.randrange(30)] = rng.choice(vocab)  # 1-token edit
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(variant)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # exhaustive ground truth (fine at n=80 in a test; never at scale)
    sims = simhash64(df).cache()
    a = sims.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sims.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    truth = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(hamming64(F.col("sa"), F.col("sb")) <= 8)
        .collect()
    }
    assert len(truth) >= 40  # every (base, variant) pair is a near-dup

    single = {
        (r.id_a, r.id_b)
        for r in simhash_neardup_pairs(df, max_hamming=8, prefix_bits=12).collect()
    }
    multi_rows = simhash_neardup_multiprobe(
        df, max_hamming=8, prefix_bits=12, tables=4
    ).collect()
    multi = {(r.id_a, r.id_b) for r in multi_rows}

    assert single <= multi <= truth
    assert len(multi) / len(truth) >= 0.9
    assert len(multi) >= len(single)
    assert all(r.hamming <= 8 for r in multi_rows)


def test_connected_components_chain_and_clique(spark):
    """A 5-node chain (diameter 4, worst case for label propagation), a
    separate triangle, and an isolated pair must resolve to min-id
    components; convergence must not stop early on the chain."""
    from syslog_kafka_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (4, 5),        # chain
            (10, 11), (11, 12), (10, 12),           # triangle
            (20, 21),                               # pair
        ],
        ["id_a", "id_b"],
    )
    labels = {r.node: r.label for r in connected_components(edges).collect()}
    assert {n: labels[n] for n in (1, 2, 3, 4, 5)} == {n: 1 for n in (1, 2, 3, 4, 5)}
    assert {labels[10], labels[11], labels[12]} == {10}
    assert labels[20] == labels[21] == 20
    assert set(labels) == {1, 2, 3, 4, 5, 10, 11, 12, 20, 21}


def test_semantic_dedup_drops_planted_near_copies(spark):
    import numpy as np

    from syslog_kafka_spark.operators.similarity import (
        _kmeans_centroids,
        semantic_dedup_frozen,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(40)]
    # plant two near-copies of vector 3 (tiny perturbation, cosine ~0.999)
    for dup_id in (100, 101):
        v = base[3] + rng.normal(scale=0.01, size=16)
        rows.append((dup_id, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    # The deployment shape: fit the coarse quantizer offline on a sample
    # (here: the corpus itself), then run the pure-function frozen pass.
    centroids = _kmeans_centroids(
        np.array([v for _, v in rows], dtype=np.float64), 4, seed=42
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup_frozen(
            df, [list(map(float, c)) for c in centroids], threshold=0.95
        ).collect()
    }
    assert len(out) == 42
    # the planted copies group with vec 3: min-id survivor is 3
    assert out[3]["in_dup_group"] and not out[3]["is_dropped"]
    for dup_id in (100, 101):
        assert out[dup_id]["is_dropped"] and out[dup_id]["kept_id"] == 3
    # everything else survives untouched
    dropped = [i for i, r in out.items() if r["is_dropped"]]
    assert sorted(dropped) == [100, 101]


def test_frozen_structures_match_their_fit_scripts():
    """The committed frozen literals (ann_frozen.py, semdedup_centroids.py)
    must be exactly what their seeded offline fits produce — a hand-edit
    or a drifted regeneration would silently invalidate every oracle
    built on them. Re-derives both from the same seeds/data and compares
    verbatim (repr-level, because the literals ARE the structure)."""
    import numpy as np

    from scripts.fit_ann_structures import (
        DIM,
        N_LISTS,
        N_PLANES,
        N_TABLES,
        SEED,
    )
    from syslog_kafka_spark.operators.ann_frozen import (
        IVF_CENTROIDS,
        SRP_PLANES,
    )
    from syslog_kafka_spark.operators.semdedup_centroids import (
        CENTROIDS as SD_CENTROIDS,
    )
    from syslog_kafka_spark.operators.similarity import _kmeans_centroids

    rng = np.random.default_rng(SEED)
    planes = np.round(rng.standard_normal((N_TABLES, N_PLANES, DIM)), 6)
    assert [[list(map(float, p)) for p in tbl] for tbl in planes] == SRP_PLANES

    import duckdb

    rows = duckdb.sql(
        "SELECT embedding FROM '/root/testdata/sf0.01/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    # ann fit consumes the SAME rng after drawing planes (see the script)
    ivf = _kmeans_centroids(mat[rng.permutation(len(mat))], N_LISTS, seed=SEED)
    assert [list(map(float, c)) for c in ivf] == IVF_CENTROIDS

    rng2 = np.random.default_rng(42)  # fit_semdedup_centroids.py's seed
    sd = _kmeans_centroids(mat[rng2.permutation(len(mat))], 8, seed=42)
    assert [list(map(float, c)) for c in sd] == SD_CENTROIDS


def test_lsh_base_kernel_matches_expression_pipeline(spark, sf_dir):
    """The Arrow-kernel LSH base (operators/dedup.lsh_base_arrow) must
    produce EXACTLY the shingle-hash arrays and MinHash signatures of
    the expression pipeline (hashed_shingles +
    minhash_signature_from_hashes) — every band bucket, candidate set,
    and verify count downstream depends on this identity."""
    import pyspark.sql.functions as F

    from syslog_kafka_spark.functions.hashes import (
        hashed_shingles,
        minhash_signature_from_hashes,
    )
    from syslog_kafka_spark.operators.dedup import lsh_base_arrow, normalized

    d = load_tables(spark, sf_dir).documents.filter(F.col("doc_id") < 50)
    inp = d.select(F.col("doc_id").alias("_id"), normalized("text").alias("_norm"))
    expr = {
        r._id: (list(r._sh), list(r._sig))
        for r in inp.withColumn("_sh", hashed_shingles(F.col("_norm"), 5))
        .withColumn("_sig", minhash_signature_from_hashes(F.col("_sh"), 16))
        .select("_id", "_sh", "_sig")
        .collect()
    }
    kern = {
        r._id: (list(r._sh), list(r._sig))
        for r in lsh_base_arrow(inp, 5, 16).collect()
    }
    assert expr.keys() == kern.keys()
    for i in expr:
        assert expr[i] == kern[i], f"doc {i}"


def test_lsh_pairs_degenerate_texts(spark):
    """The r7 ids-only band join + array join-back must preserve the
    degenerate-input semantics of the carry-arrays shape: NULL-text docs
    (null shingles/signature — they collide in one bucket via
    concat_ws's null-skip, then their null Jaccard fails the threshold),
    empty and sub-k texts (one shingle, can still genuinely match), and
    exact duplicates (jaccard 1.0)."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, None),
            (4, None),
            (5, ""),
            (6, "abc"),
            (7, "zz"),
        ],
        "doc_id INT, text STRING",
    )
    out = {(r.id_a, r.id_b): r.jaccard for r in minhash_lsh_pairs(df, verify_threshold=0.5).collect()}
    assert out.get((1, 2)) == 1.0, "exact duplicates must verify at 1.0"
    for pair in out:
        assert 3 not in pair and 4 not in pair, "null-text docs must never pair"


def _mirror_lsh_base(text: str, k: int = 5, n_hashes: int = 16):
    """Pure-Python mirror of lsh_base_arrow / the expression pipeline."""
    import hashlib

    from syslog_kafka_spark.functions.hashes import _MINHASH_P, _minhash_coeffs

    n = max(len(text) - (k - 1), 1)
    grams = dict.fromkeys(text[i : i + k] for i in range(n))
    hs = []
    for g in grams:
        h = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
        if h not in hs:
            hs.append(h)
    sig = [
        min((((h & 0x7FFFFFFF) * a + b) % _MINHASH_P) for h in hs)
        for a, b in _minhash_coeffs(n_hashes)
    ]
    return hs, sig


def test_lsh_base_kernel_unicode_property(spark):
    """Kernel-vs-expression parity on adversarial text: multi-byte
    unicode (substr is CHARACTER-indexed in Spark, like Python slicing —
    a byte-indexed kernel would diverge here), whitespace-only, shorter
    than k, repeated grams. Checked against the pure-Python mirror AND
    the Column-expression pipeline."""
    import pyspark.sql.functions as F

    from syslog_kafka_spark.functions.hashes import (
        hashed_shingles,
        minhash_signature_from_hashes,
    )
    from syslog_kafka_spark.operators.dedup import lsh_base_arrow

    texts = [
        "héllo wörld — ünïcode κόσμος 你好世界 🌍🌎🌏",
        "aaaaaaaaaaaaaaaa",
        "ab",
        " ",
        "tab\tand  spaces collapse",
        "ドキュメント の 重複 検出 テスト だよ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["_id", "_norm"]
    )
    kern = {r._id: (list(r._sh), list(r._sig)) for r in lsh_base_arrow(df, 5, 16).collect()}
    expr = {
        r._id: (list(r._sh), list(r._sig))
        for r in df.withColumn("_sh", hashed_shingles(F.col("_norm"), 5))
        .withColumn("_sig", minhash_signature_from_hashes(F.col("_sh"), 16))
        .collect()
    }
    for i, t in enumerate(texts):
        assert kern[i] == expr[i], f"kernel != expression for {t!r}"
        hs, sig = _mirror_lsh_base(t)
        assert kern[i] == (hs, sig), f"kernel != mirror for {t!r}"


def test_pair_scan_null_and_type_semantics(spark):
    """The per-block pair-scan kernel preserves the old self-join
    semantics on degenerate inputs: NULL-labeled rows never pair (inner
    join on label), NULL text contributes no winnowing fingerprints, and
    a non-bigint id type survives the kernel round trip."""
    import pyspark.sql.functions as F

    from syslog_kafka_spark.operators.similarity import embedding_neardup_pairs

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 7),
            (2, [1.0, 0.0], 7),
            (3, [1.0, 0.0], None),  # NULL label: must pair with nothing
            (4, [1.0, 0.0], None),
        ],
        "vec_id INT, embedding ARRAY<FLOAT>, label INT",
    )
    pairs = embedding_neardup_pairs(emb, threshold=0.9).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert pairs[0].asDict()["id_a"] == 1  # int32 id survived (no bigint cast error)

    from syslog_kafka_spark.plans.llm import winnow_arrow_pairs

    docs = spark.createDataFrame(
        [(1, "some reasonable document text here"), (2, None)],
        "doc_id BIGINT, _nt STRING",
    )
    got = winnow_arrow_pairs(docs, 8, 4).collect()
    assert got and all(r.doc_id == 1 for r in got)  # null doc: zero rows


def test_bigram_builder_survives_short_docs(spark):
    """r9 self-review catch: F.sequence(1, 0) DESCENDS to [1, 0] (it is
    never empty), so the unguarded bigram transform indexed past the
    token array for 0/1-token documents and threw under ANSI — while the
    DuckDB oracles' generate_series(1, 0) is empty and quietly skips the
    doc. The shared builder must drop such docs exactly like the SQL."""
    import pyspark.sql.functions as F

    from syslog_kafka_spark.functions.text import tokens
    from syslog_kafka_spark.plans.mining import _bigrams_col

    df = spark.createDataFrame([("",), ("one",), ("two words",)], "text string")
    base = df.select(tokens("text").alias("_toks"))
    out = base.select(F.explode(_bigrams_col()).alias("bigram")).collect()
    assert [r["bigram"] for r in out] == ["two words"]


def test_bpe_merge_apply_fold_is_greedy_left_to_right(spark):
    """The merge fold must implement CANONICAL greedy non-overlapping
    BPE application — hand-pinned against reference-trainer behavior,
    because the DuckDB oracle only proves the two engines AGREE, not
    that they agree on the right semantics. The overlap cases are the
    traps: 'aaa' under merge (a,a) → [aa, a] (a freshly merged symbol
    must not re-match as its left half), 'abab' under (a,b) → [ab, ab],
    and a merged symbol pairing with its neighbor afterwards."""
    import pyspark.sql.functions as F

    from syslog_kafka_spark.plans.mining import _bpe_apply_merge

    v = spark.createDataFrame(
        [("aaa", 1), ("abab", 1), ("xaby", 1), ("ba", 1)], "word string, freq long"
    ).select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )

    def apply(vdf, a, b):
        top1 = spark.createDataFrame([(a, b)], "m_a string, m_b string")
        return _bpe_apply_merge(vdf, top1)

    got = {
        r["word"]: r["syms"]
        for r in apply(v, "a", "a").collect()
    }
    assert got["aaa"] == ["aa", "a"]  # greedy, non-overlapping
    assert got["abab"] == ["a", "b", "a", "b"]  # untouched

    got = {r["word"]: r["syms"] for r in apply(v, "a", "b").collect()}
    assert got["abab"] == ["ab", "ab"]  # adjacent occurrences both merge
    assert got["xaby"] == ["x", "ab", "y"]
    assert got["ba"] == ["b", "a"]  # ordered pair: (a,b) ≠ (b,a)

    # a merged symbol participates in the NEXT iteration's pairs:
    # apply (a,b) then (ab,y) — 'xaby' becomes [x, aby]
    v2 = apply(v, "a", "b")
    got = {r["word"]: r["syms"] for r in apply(v2, "ab", "y").collect()}
    assert got["xaby"] == ["x", "aby"]
    assert got["abab"] == ["ab", "ab"]  # no 'y' neighbor: untouched
