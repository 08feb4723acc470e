"""Letter-permutation vocab widening + a fast local BPE trainer twin.

The test corpus's vocabulary is 31 words whose pair space exhausts at 89
merges, so every merge in a table fit on it MATCHES during encode — but
89 ranks cannot price a production-size table. The r11 probe padded the
table with can't-match ranks, which prices table LENGTH but makes every
padded rank a guaranteed ``a not in out`` miss (r11 verdict item #5):
what it cannot price is a 4k-rank table whose ranks genuinely fire. This
module widens the vocab deterministically — each word replicated under P
letter-permutations (stride × shift affine maps over a–z, the classic
affine cipher; strides coprime with 26 so each map is a bijection) — so
a to-convergence fit (scripts/fit_bpe_wide.py) produces THOUSANDS of
genuinely-matching merges, and :func:`local_bpe_fit` is the pure-Python
twin of the gated Spark trainer loop (plans/mining.llm_bpe_merge_apply:
count adjacent pairs freq-weighted per occurrence, pick freq DESC /
pair_key ASC, apply one greedy left-to-right non-overlapping pass) fast
enough to run thousands of iterations offline.

Reference scope: the reference repo has no tokenizer; this extends the
training-data-pipeline surface (SURVEY.md §2B.10).
"""

from __future__ import annotations

from collections.abc import Sequence

from syslog_kafka_spark.operators.bpe_kernel import fuse_pass

# chr(31) — the same pair-key delimiter plans/mining.py uses
_US = chr(31)

# strides coprime with 26: each (stride, shift) affine map is a bijection
_STRIDES = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)


def _affine_map(stride: int, shift: int) -> dict[str, str]:
    return {
        chr(ord("a") + i): chr(ord("a") + (i * stride + shift) % 26)
        for i in range(26)
    }


def widen_vocab(
    vocab: Sequence[tuple[str, int]], perms: int
) -> list[tuple[str, int]]:
    """Replicate each (word, freq) under ``perms`` affine letter maps.

    Permutation 0 is the identity (the original corpus slice rides
    along); maps are enumerated stride-major so any prefix of the family
    is stable as ``perms`` grows. Non a–z characters pass through.
    Collisions (two maps sending different words to the same string)
    merge by summing freq, matching what ``bpe_vocab``'s groupBy would
    do on the concatenated corpus.
    """
    out: dict[str, int] = {}
    n = 0
    for stride in _STRIDES:
        for shift in range(26):
            if n >= perms:
                break
            m = _affine_map(stride, shift)
            for word, freq in vocab:
                w = "".join(m.get(ch, ch) for ch in word)
                out[w] = out.get(w, 0) + int(freq)
            n += 1
        if n >= perms:
            break
    return sorted(out.items())


def local_bpe_fit(
    vocab: Sequence[tuple[str, int]], k: int = 0
) -> list[tuple[str, str]]:
    """Pure-Python twin of the gated Spark trainer loop; ``k <= 0`` runs
    to convergence. Tie-break identical to the gate: freq DESC, then the
    chr(31)-delimited pair key ASC (plain code-point comparison — both
    engines compare these all-ASCII keys bytewise)."""
    syms: dict[str, list[str]] = {w: list(w) for w, _ in vocab}
    freqs: dict[str, int] = {w: int(f) for w, f in vocab}
    merges: list[tuple[str, str]] = []
    while k <= 0 or len(merges) < k:
        counts: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + _US + kv[0][1])
        )[0]
        merges.append(best)
        a, b = best
        for w, s in syms.items():
            if a not in s:
                continue
            # the ONE fuse-pass definition (operators/bpe_kernel) — the
            # trainer twin cannot de-twin from the encoders
            syms[w] = fuse_pass(s, a, b)
    return merges
