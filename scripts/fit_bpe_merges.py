"""Fit and FREEZE the BPE merge table for llm_bpe_encode_frozen.

Runs the trainer loop (the exact `_bpe_pair_counts` + `bpe_apply_fold`
pair llm_bpe_merge_apply gates) for K merges over the sf0.01 corpus —
the driver's correctness scale, so the frozen artifact is the table the
gated trainer would produce there — and writes the result as
`operators/bpe_frozen.py`. Freezing makes the encoder a pure function
both engines hash-compare (the ivf_refit_frozen precedent: fit offline,
freeze, gate forever).

Usage: python scripts/fit_bpe_merges.py [--sf-dir DIR] [--k K]
                                        [--out FILE --var NAME]

With ``--k 0`` the loop runs TO CONVERGENCE (until no adjacent pair
remains — every vocab word fully merged to one symbol), which is how
``operators/bpe_frozen_full.py`` (the merge-table-as-data encoder's
table) was produced: 89 merges on this corpus.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K_DEFAULT = 8


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=K_DEFAULT, help="0 = to convergence")
    ap.add_argument("--out", default=None, help="output module path")
    ap.add_argument("--var", default="BPE_MERGES", help="frozen table name")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from syslog_kafka_spark.plans.mining import (
        _US,
        _bpe_apply_merge,
        _bpe_pair_counts,
        bpe_vocab,
    )
    from syslog_kafka_spark.session import get_spark

    spark = get_spark("fit-bpe-merges")
    spark.sparkContext.setLogLevel("ERROR")

    d = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    # the SAME vocab definition the trainer gates and the encoder reads —
    # a drifted copy here would train merges on words the encoder never
    # sees, and no hash gate could catch it
    v = bpe_vocab(d).cache()
    v.count()

    merges: list[tuple[str, str]] = []
    it = 0
    while args.k <= 0 or it < args.k:
        counts = _bpe_pair_counts(v)
        top = counts.orderBy(F.desc("freq"), F.asc("pair_key")).limit(1).collect()
        if not top:
            break  # pair space exhausted: every word is one symbol
        a, b = top[0]["pair_key"].split(_US)
        merges.append((a, b))
        it += 1
        print(f"merge {it}: ({a!r}, {b!r}) freq={top[0]['freq']}")
        if args.k <= 0 or it < args.k:  # the k-th rewritten vocab is never read
            top1 = spark.createDataFrame([(a, b)], "m_a string, m_b string")
            nxt = _bpe_apply_merge(v, top1).cache()
            nxt.count()
            v.unpersist()
            v = nxt

    out = args.out or os.path.join(
        REPO, "syslog_kafka_spark", "operators", "bpe_frozen.py"
    )
    converged = " (to convergence: pair space exhausted)" if args.k <= 0 else ""
    with open(out, "w") as fh:
        fh.write(
            '"""FROZEN BPE merge table — GENERATED FILE.\n\n'
            f"Derived by scripts/fit_bpe_merges.py ({len(merges)} merges{converged},\n"
            f"fit on {args.sf_dir} with the exact trainer loop\n"
            "llm_bpe_merge_apply gates). Frozen so the encode queries are pure\n"
            "functions both engines hash-compare. Regenerate with the script;\n"
            'never hand-edit."""\n\n'
            "# rank-ordered (first merge applies first, exactly as trained)\n"
            f"{args.var}: list[tuple[str, str]] = {merges!r}\n"
        )
    print(f"wrote {out} ({len(merges)} merges)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
