"""Gate-twin invariants for the merge-table-as-data BPE encode path.

The Arrow kernel (operators/bpe_kernel.py) and the frozen fold
expression (plans/mining.bpe_apply_fold) must be the SAME function:
llm_bpe_encode_table's correctness rests on the kernel replaying
exactly what the gated trainer trained.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from syslog_kafka_spark.operators.bpe_frozen import BPE_MERGES
from syslog_kafka_spark.operators.bpe_kernel import (
    apply_merges,
    bpe_checkpoint_token_counts,
    bpe_encode_tokens,
)
from syslog_kafka_spark.plans.mining import bpe_apply_fold
from syslog_kafka_spark.plans.registry import load_all

# Words that hit every branch of the fold semantics: overlapping runs
# (greedy left-to-right non-overlap), a merge whose output feeds a later
# merge, m_a==m_b, misses, and single symbols.
_ADVERSARIAL = [
    "aaaa",
    "aaab",
    "abab",
    "baaa",
    "abba",
    "a",
    "zz",
    "merger",
    "instant",
    "lululu",
]
_MERGE_SEQS = [
    [("a", "a")],
    [("a", "a"), ("aa", "aa")],
    [("a", "b"), ("ab", "ab")],
    [("a", "b"), ("b", "a")],
    [("l", "u"), ("lu", "lu")],
    BPE_MERGES,
]


@pytest.mark.parametrize("merges", _MERGE_SEQS, ids=[str(i) for i in range(len(_MERGE_SEQS))])
def test_python_kernel_matches_spark_fold_symbol_by_symbol(spark, merges):
    df = spark.createDataFrame([(w,) for w in _ADVERSARIAL], "word string").select(
        "word",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    cur = F.col("syms")
    for a, b in merges:
        cur = bpe_apply_fold(cur, F.lit(a), F.lit(b))
    rows = df.select("word", cur.alias("folded")).collect()
    for r in rows:
        assert apply_merges(list(r.word), merges) == list(r.folded), (
            r.word,
            merges,
        )


def test_arrow_kernel_histogram_equals_frozen_expression_query(spark, sf_dir):
    """bpe_encode_tokens on the 8-merge frozen table == the gated
    llm_bpe_encode_frozen output, row for row — the data path and the
    expression path cannot de-twin."""
    from syslog_kafka_spark.plans.mining import _bpe_histogram, bpe_vocab
    from syslog_kafka_spark.plans.tpch_like import load_tables

    d = load_tables(spark, sf_dir).documents
    encode = bpe_encode_tokens(BPE_MERGES)
    enc = bpe_vocab(d).select(
        "word", "freq", F.size(encode(F.col("syms"))).alias("n_tokens")
    )
    via_kernel = [tuple(r) for r in _bpe_histogram(enc).collect()]
    via_expr = [
        tuple(r)
        for r in load_all()["llm_bpe_encode_frozen"].build(spark, sf_dir).collect()
    ]
    assert via_kernel == via_expr


def test_curve_rank8_slice_equals_frozen_histogram(spark, sf_dir):
    """The merges_applied=8 slice of the compression curve must equal the
    frozen-expression histogram on the shared columns (the full table's
    first 8 ranks ARE the frozen table — scripts/fit_bpe_merges.py is
    deterministic, and the curve kernel replays ranks in order)."""
    curve = load_all()["llm_bpe_encode_table"].build(spark, sf_dir)
    rank8 = {
        (r.bucket): (r.n_words, r.corpus_freq, r.total_chars, r.total_tokens)
        for r in curve.collect()
        if r.merges_applied == 8
    }
    frozen = {
        (r.bucket): (r.n_words, r.corpus_freq, r.total_chars, r.total_tokens)
        for r in load_all()["llm_bpe_encode_frozen"].build(spark, sf_dir).collect()
    }
    assert rank8 == frozen


def test_full_table_prefix_is_the_frozen_table():
    from syslog_kafka_spark.operators.bpe_frozen_full import BPE_MERGES_FULL

    assert BPE_MERGES_FULL[: len(BPE_MERGES)] == BPE_MERGES


def test_checkpoint_validation():
    with pytest.raises(ValueError):
        bpe_checkpoint_token_counts([("a", "b")], [2])  # past table end
    with pytest.raises(ValueError):
        bpe_checkpoint_token_counts([("a", "b")], [1, 1, 0])  # not ascending
