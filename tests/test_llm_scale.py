"""Semantics tests for the scale-path curation tier (plans/llm_scale).

Exact value parity is the driver oracle's job (each query is
hash-gated); these tests pin the *invariants* the oracle hash cannot
express — weight normalization, Bloom one-sidedness, keep-first
accounting — so a future refactor that stays self-consistent with a
wrong recipe still fails loudly.
"""

from __future__ import annotations

from syslog_kafka_spark.plans import llm_scale
from syslog_kafka_spark.sources.readers import load_tables


def test_temperature_mix_weights_normalize_and_flatten(spark, sf_dir):
    """Each alpha column is a distribution (sums to 1), and alpha<1
    flattens it: the heaviest domain's weight shrinks monotonically as
    alpha drops, while a light domain's effective epochs exceed the
    heavy domain's (the over-sampling the audit exists to expose)."""
    rows = llm_scale.llm_domain_temperature_mix(spark, sf_dir).collect()
    assert len(rows) >= 2
    for col in ("w_a30", "w_a50", "w_a70"):
        assert abs(sum(r[col] for r in rows) - 1.0) < 1e-3
    heavy = max(rows, key=lambda r: r.sum_tokens)
    light = min(rows, key=lambda r: r.sum_tokens)
    if heavy.sum_tokens > light.sum_tokens:
        assert heavy.w_a30 <= heavy.w_a50 <= heavy.w_a70
        assert light.w_a30 >= light.w_a50 >= light.w_a70
        assert light.epochs_a50 >= heavy.epochs_a50


def test_embedding_dim_stats_covers_every_dim(spark, sf_dir):
    """One row per dimension, each seeing every vector, with internally
    consistent order statistics (rounding tolerance: mean is 4 dp)."""
    n_vec = load_tables(spark, sf_dir).embeddings.count()
    rows = llm_scale.llm_embedding_dim_stats(spark, sf_dir).collect()
    assert [r.dim for r in rows] == list(range(64))
    for r in rows:
        assert r.n == n_vec
        assert r.var_x >= 0.0
        assert r.min_x - 1e-3 <= r.mean_x <= r.max_x + 1e-3


def test_bloom_decontamination_is_one_sided(spark, sf_dir):
    """A Bloom filter can false-positive but never false-negative:
    every exact train-gram hit must also be a bloom hit, the
    false-positive column is exactly the gap, and the flag fires iff
    any gram hit the filter."""
    rows = llm_scale.llm_bloom_decontamination(spark, sf_dir).collect()
    assert rows, "sf0.001 must contain test-split documents"
    for r in rows:
        assert r.n_bloom_hits >= r.n_exact_hits
        assert r.n_false_pos == r.n_bloom_hits - r.n_exact_hits
        assert r.flagged == (r.n_bloom_hits > 0)
        assert r.n_test_grams >= r.n_bloom_hits


def test_chunk_dedup_removal_keep_first_accounting(spark, sf_dir):
    """Every document reports, dup counts are bounded by chunk counts,
    and the keep-first rule leaves at least one survivor per corpus
    (total dups strictly under total chunks)."""
    n_docs = load_tables(spark, sf_dir).documents.count()
    rows = llm_scale.llm_chunk_dedup_removal(spark, sf_dir).collect()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r.n_dup_chunks <= r.n_chunks
        # dup tokens exist only where dup chunks do, and never exceed the
        # 32-token stride times the dup-chunk count (the reverse implication
        # is NOT universal: two empty docs share a zero-token dup chunk)
        assert 0 <= r.dup_tokens <= r.n_dup_chunks * 32
        if r.dup_tokens > 0:
            assert r.n_dup_chunks > 0
    assert sum(r.n_dup_chunks for r in rows) < sum(r.n_chunks for r in rows)


def test_cms_error_is_one_sided(spark, sf_dir):
    """Count-min never underestimates: est ≥ exact on every probe, and
    the relative-error column is exactly the scaled gap."""
    rows = llm_scale.llm_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_est >= r.exact_cnt
        assert r.overest == r.cms_est - r.exact_cnt
        assert r.rel_overest >= 0.0


def test_mixture_subsample_budget_and_bounds(spark, sf_dir):
    """Keep probabilities are probabilities, kept mass never exceeds the
    domain's mass, the achieved shares form a distribution, and at least
    one domain is actually down-sampled (beta=0.5 guarantees the filter
    bites somewhere)."""
    rows = llm_scale.llm_mixture_subsample(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 0.0 <= r.keep_prob <= 1.0
        assert 0 <= r.n_kept <= r.n_docs
        assert 0 <= r.kept_tokens <= r.n_tokens
    assert abs(sum(r.achieved_share for r in rows) - 1.0) < 1e-3
    assert any(r.n_kept < r.n_docs for r in rows)


def test_epoch_upsample_realizes_the_temperature_target(spark, sf_dir):
    """Copy counts are non-negative integers consistent with epochs
    (every domain emits between floor(epochs)*n_docs and
    ceil(epochs)*n_docs copies), at least one domain is genuinely
    up-sampled (epochs > 1 emits more copies than docs), and the
    achieved shares form a distribution."""
    import math

    rows = llm_scale.llm_epoch_upsample_plan(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        lo = math.floor(r.epochs) * r.n_docs
        hi = math.ceil(r.epochs) * r.n_docs
        assert lo <= r.n_copies <= hi, r
        assert r.emitted_tokens >= 0
    assert any(r.epochs > 1 and r.n_copies > r.n_docs for r in rows)
    assert abs(sum(r.achieved_share for r in rows) - 1.0) < 1e-3


def test_shard_shuffle_is_deterministic_and_covers_the_corpus(spark, sf_dir):
    """Same assignment on every run, every document lands in exactly one
    shard, and the balance ratios center on 1."""
    df1 = llm_scale.llm_shard_shuffle_assignment(spark, sf_dir).collect()
    df2 = llm_scale.llm_shard_shuffle_assignment(spark, sf_dir).collect()
    assert df1 == df2
    from syslog_kafka_spark.sources.readers import load_tables

    n_docs = load_tables(spark, sf_dir).documents.count()
    assert sum(r.n_docs for r in df1) == n_docs
    mean_ratio = sum(r.balance_ratio for r in df1) / len(df1)
    assert 0.5 < mean_ratio < 1.5


def test_source_overlap_matrix_bounds(spark, sf_dir):
    """Full pair matrix (k choose 2 rows), jaccard/containment in [0,1],
    jaccard never exceeds containment, shared never exceeds the smaller
    set."""
    rows = llm_scale.llm_source_overlap_matrix(spark, sf_dir).collect()
    k = len({r.source_a for r in rows} | {r.source_b for r in rows})
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert 0 <= r.shared_grams <= min(r.grams_a, r.grams_b)
        assert 0.0 <= r.jaccard <= r.containment <= 1.0


def test_hll_estimate_within_sketch_error(spark, sf_dir):
    """1024 registers give a ~3.25% standard error; assert a loose 5x
    envelope per source plus structural register bounds."""
    rows = llm_scale.llm_hll_vocab_cardinality(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 0 < r.used_registers <= 1024
        assert r.hll_raw > 0
        # the combined estimator (regime rule applied) carries the bound;
        # raw alone is biased high at small cardinalities by design
        assert r.rel_err <= 0.17, r
        assert r.hll_est in (r.hll_raw, r.hll_linear)
        if r.used_registers == 1024:
            assert r.hll_linear is None
        else:
            assert r.hll_linear > 0


def test_quantile_sketch_error_bounded_by_bucket_width(spark, sf_dir):
    """Histogram interpolation can never miss by more than one bucket
    width, and the approximations are monotone in p."""
    rows = llm_scale.llm_length_quantile_sketch(spark, sf_dir).collect()
    assert [r.p for r in rows] == [0.5, 0.9, 0.99]
    for r in rows:
        assert r.abs_err <= 16.0, r
    qs = [r.approx_q for r in rows]
    assert qs == sorted(qs)


def test_semantic_decontamination_flags_consistently(spark, sf_dir):
    """Every test vector gets a verdict, the flag is exactly the rounded
    threshold comparison, cosines are cosines, and tau separates the
    population (both flag states occur)."""
    rows = llm_scale.llm_semantic_decontamination(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_candidates >= 1
        assert -1.0001 <= r.best_cosine <= 1.0001
        assert r.flagged == (r.best_cosine >= 0.3)
    assert any(r.flagged for r in rows) and any(not r.flagged for r in rows)


def test_session_transcripts_cover_every_event_once(spark, sf_dir):
    """Transcript assembly is a partition of the event stream: session
    event counts sum to the corpus total, session ids are 1-based and
    contiguous per user, and spans are non-negative."""
    rows = llm_scale.llm_session_transcripts(spark, sf_dir).collect()
    n_events = load_tables(spark, sf_dir).events.count()
    assert sum(r.n_events for r in rows) == n_events
    by_user: dict[int, list[int]] = {}
    for r in rows:
        assert r.span_secs >= 0
        assert r.n_chars > 0
        by_user.setdefault(r.user_id, []).append(r.session_id)
    for sids in by_user.values():
        assert sorted(sids) == list(range(1, len(sids) + 1))


def test_curation_funnel_is_monotone(spark, sf_dir):
    """Survivor counts never rise through the funnel, the input row is
    the full corpus at 100%, and every gate actually bites on this
    corpus (each stage strictly drops documents)."""
    rows = llm_scale.llm_scale_curation_funnel(spark, sf_dir).collect()
    assert [r.stage_name for r in rows] == ["input", "quality", "dedup", "mixture"]
    assert rows[0].pct_docs == 1.0 and rows[0].pct_tokens == 1.0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_docs < prev.n_docs, (prev, cur)
        assert cur.sum_tokens <= prev.sum_tokens
        assert 0.0 <= cur.pct_docs <= 1.0


def test_keep_best_picks_a_maximal_member(spark, sf_dir):
    """Every reported group is a real collision (≥2 docs) and the kept
    member's score bounds the group's minimum."""
    rows = llm_scale.llm_dedup_keep_best(spark, sf_dir).collect()
    for r in rows:
        assert r.n_docs >= 2
        assert r.kept_score >= r.min_score


def test_hll_rho_bitlength_trick_three_way(spark):
    """The rho computation (51 - bit length of the 50-bit hash remainder,
    via binary-string length) must agree between Spark's conv(), DuckDB's
    bin(), and Python's int.bit_length() on every boundary shape: zero,
    exact powers of two (where floating log2 misrounds), their
    neighbours, the domain max, and a seeded random sample."""
    import random

    import duckdb
    import pyspark.sql.functions as F

    vals = {0, 1, 2, 3, (1 << 50) - 1}
    for k in range(1, 50):
        vals.update({1 << k, (1 << k) - 1, (1 << k) + 1})
    rng = random.Random(7)
    vals.update(rng.randrange(1 << 50) for _ in range(200))
    vals = sorted(vals)
    expected = [51 - v.bit_length() for v in vals]

    df = spark.createDataFrame([(v,) for v in vals], "w LONG")
    bitlen = F.length(F.conv(F.col("w"), 10, 2))
    rho = F.when(F.col("w") == 0, F.lit(51)).otherwise(F.lit(51) - bitlen)
    got_spark = [r[0] for r in df.select(rho).collect()]
    assert got_spark == expected

    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT CASE WHEN {v} = 0 THEN 51"
            f" ELSE 51 - length(bin(CAST({v} AS BIGINT))) END"
        ).fetchone()[0]
        for v in vals
    ]
    assert got_duck == expected


def test_signed_zero_normalization_trick(spark):
    """round() of a tiny negative yields -0.0 (DuckDB keeps the sign,
    Spark may not) and the driver canon reprs -0.0 != 0.0 — the
    `round(x, n) + 0.0` form must normalize it on BOTH engines while
    leaving every other value untouched."""
    import duckdb

    import pyspark.sql.functions as F

    row = spark.range(1).select(
        (F.round(F.lit(-2e-05), 4) + 0.0).alias("z"),
        (F.round(F.lit(-0.12344999), 4) + 0.0).alias("nz"),
    ).collect()[0]
    assert repr(row.z) == "0.0"
    assert repr(row.nz) == "-0.1234"

    con = duckdb.connect()
    z, nz = con.execute(
        "SELECT ROUND(-0.00002::DOUBLE, 4) + 0.0, ROUND(-0.12344999::DOUBLE, 4) + 0.0"
    ).fetchone()
    assert repr(z) == "0.0" and repr(nz) == "-0.1234"
    # and WITHOUT the + 0.0 DuckDB really does keep the sign (the hazard)
    raw = con.execute("SELECT ROUND(-0.00002::DOUBLE, 4)").fetchone()[0]
    assert repr(raw) == "-0.0"


def test_float_stats_are_parallelism_invariant(spark, sf_dir):
    """Results must not depend on partition count: re-running the most
    accumulation-order-sensitive queries (zero-centered float stats,
    sketch sums, weight normalizations) under shuffle.partitions=7 with
    AQE off must produce byte-identical canon rows to the session
    default (32 + AQE). A failure here means the result would differ on
    a real cluster whenever the partitioning changes — the signed-zero
    class writ large. (A full-inventory sweep of this check passed for
    all 224 oracled queries at sf0.01 in r7.)"""
    from scripts.driver_sim import canon_rows

    names = [
        "llm_embedding_dim_stats",
        "llm_domain_temperature_mix",
        "llm_hll_vocab_cardinality",
        "llm_length_quantile_sketch",
        "llm_mixture_subsample",
        # r9 additions with order-sensitive float accumulations: the
        # k-weighted NLL mean and the per-(list,dim) refit means
        "llm_perplexity_buckets",
        "llm_ivf_refit_drift_audit",
        # r10 additions (integer-exact by design — this pins that claim:
        # fold-encoded token counts and bitmap-probe digests must be
        # placement-independent)
        "llm_bpe_encode_frozen",
        "stream_decontamination_probe",
    ]
    from syslog_kafka_spark.plans.registry import load_all

    specs = load_all()
    base = {
        n: canon_rows(specs[n].build(spark, sf_dir).toPandas()) for n in names
    }
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for n in names:
            got = canon_rows(specs[n].build(spark, sf_dir).toPandas())
            assert got == base[n], f"{n} drifted under repartitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_kmv_estimates_are_exact_below_k_and_bounded_above(spark, sf_dir):
    """A KMV sketch holding fewer than k values IS the exact set: pairs
    whose true union is under k must estimate it exactly. Larger pairs
    must stay inside a loose 4-sigma envelope (k=256 → ~6.3% std err),
    and the jaccard/intersection estimates must be internally
    consistent."""
    rows = llm_scale.llm_kmv_source_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact_union = r.exact_a + r.exact_b - r.exact_inter
        assert 0 <= r.exact_inter <= min(r.exact_a, r.exact_b)
        assert 0.0 <= r.kmv_jaccard_est <= 1.0
        assert r.kmv_inter_est >= 0.0
        if exact_union < 256:
            assert r.union_rel_err == 0.0, r
        else:
            assert r.union_rel_err <= 0.25, r
