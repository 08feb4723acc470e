"""Merge-table-as-DATA BPE encoding — the Arrow-kernel scale path.

The frozen-expression encoder (``llm_bpe_encode_frozen``) inlines each
merge as one higher-order fold in the plan: at 8 merges that is the
fastest shape (pure JVM, zero Python), but the expression tree grows
with the merge count and both engines' expression machinery falls over
far below production merge counts. Measured at sf0.01 with the vocab
cached so the timed region is the ENCODE alone
(scripts/bpe_crossover_probe.py): the expression path takes 1.2 s at
8 merges, 2.0 s at 32, 2.8 s at 48, and HARD-FAILS past ~48 (Catalyst
analyzer: "Max iterations (100) reached for batch Resolution");
DuckDB's binder likewise refuses >~48 nested folds
(recursion-depth/parser-memory limits). The table path below is flat
≤0.75 s at every k through the full 89-merge table — and table LENGTH
is nearly free (~0.03 s warm with the table padded to 256/1024/4096
entries, output asserted identical) — hash-equal to the expression
path wherever both run. A production tokenizer
(32k–100k merges) ships its merge table as DATA: every executor holds
the rank-ordered list once (it rides the serialized kernel closure —
one copy per executor, exactly a broadcast's distribution shape, a few
MB at 100k merges) and encoding is a per-word loop over Arrow-batched
rows. That is this kernel.

Semantics are pinned to the trainer: :func:`apply_merges` is the
pure-Python twin of ``plans.mining.bpe_apply_fold`` (one merge = one
greedy left-to-right non-overlapping pass), and
``tests/test_bpe_kernel.py`` gates the two equal symbol-by-symbol on
adversarial words plus histogram-equal on the 8-merge frozen table —
so the expression path and the data path cannot de-twin.

Reference scope: the reference repo has no tokenizer; this extends the
training-data-pipeline surface (SURVEY.md §2B.10).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StringType


def apply_merges(
    syms: Sequence[str], merges: Sequence[tuple[str, str]]
) -> list[str]:
    """Apply a rank-ordered merge table to one symbol sequence.

    Each merge is one greedy left-to-right non-overlapping pass —
    identical semantics to ``bpe_apply_fold``: when the running
    output's LAST symbol is exactly ``a`` and the incoming symbol is
    ``b`` they fuse, and the fused symbol immediately stops re-matching
    ``a`` (so a run like ``aaa`` under ``(a, a)`` yields ``[aa, a]``).
    """
    out = list(syms)
    for a, b in merges:
        if a not in out:  # cheap rank skip: most merges miss most words
            continue
        nxt: list[str] = []
        for x in out:
            if nxt and nxt[-1] == a and x == b:
                nxt[-1] = a + b
            else:
                nxt.append(x)
        out = nxt
    return out


def bpe_encode_tokens(merges: Sequence[tuple[str, str]]):
    """Column kernel: ``array<string>`` symbols → encoded ``array<string>``.

    Arrow-batched (``pandas_udf``): the per-row Python loop runs over
    vocab-sized input (distinct words), never the corpus — the corpus
    statistics are recovered by frequency weighting, so the Python cost
    is bounded by |vocab|, not |tokens|.
    """
    table = [(str(a), str(b)) for a, b in merges]

    @pandas_udf(ArrayType(StringType()))
    def encode(syms: pd.Series) -> pd.Series:
        return syms.map(lambda s: apply_merges(list(s), table))

    return encode


def bpe_checkpoint_token_counts(
    merges: Sequence[tuple[str, str]], checkpoints: Sequence[int]
):
    """Column kernel: symbols → ``array<int>`` of token counts, one per
    checkpoint rank (count after applying the first ``c`` merges).

    One sequential pass over the full table, sampling ``len(out)`` at
    each checkpoint — the compression-curve surface: every intermediate
    merge state is pinned, so a single mis-ordered rank moves some
    checkpoint's counts. ``checkpoints`` must be ascending and end at
    most at ``len(merges)``.
    """
    table = [(str(a), str(b)) for a, b in merges]
    cks = list(checkpoints)
    # strictly ascending: a duplicate rank would emit duplicate Spark rows
    # while a SQL oracle's IN-list matches each rank once — a confusing
    # hash-gate failure
    if any(b <= a for a, b in zip(cks, cks[1:])) or (
        cks and cks[-1] > len(table)
    ):
        raise ValueError(f"bad checkpoints {cks} for {len(table)} merges")

    def counts(syms) -> list[int]:
        out = list(syms)
        res = []
        rank = 0
        for c in cks:
            out = apply_merges(out, table[rank:c])
            rank = c
            res.append(len(out))
        return res

    @pandas_udf(ArrayType(IntegerType()))
    def encode(syms: pd.Series) -> pd.Series:
        return syms.map(counts)

    return encode
