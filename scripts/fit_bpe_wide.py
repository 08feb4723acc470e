"""Fit and FREEZE a production-count BPE merge table with MATCHING ranks.

The corpus vocab (31 words) exhausts its pair space at 89 merges, so the
r11 probe priced long tables with no-op padding — every padded rank a
guaranteed ``a not in out`` miss (r11 verdict item #5). This script
widens the vocab deterministically (operators/bpe_wide.widen_vocab:
each word under P affine letter-permutations), runs the pure-Python
trainer twin (local_bpe_fit — pinned rank-for-rank to the Spark loop by
tests/test_bpe_kernel.py) TO CONVERGENCE, and freezes the result as
``operators/bpe_wide_frozen.py``: a ≥4k-rank table every rank of which
genuinely fires on its vocab, the shape scripts/bpe_crossover_probe.py
--wide prices.

Usage: python scripts/fit_bpe_wide.py [--sf-dir DIR] [--perms P]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    # default matches the COMMITTED frozen artifact (128 perms / 6,770
    # merges) so the documented "regenerate with the script" reproduces
    # it rather than silently writing a half-size 64-perm fit
    ap.add_argument("--perms", type=int, default=128)
    args = ap.parse_args()

    from syslog_kafka_spark.operators.bpe_wide import local_bpe_fit, widen_vocab
    from syslog_kafka_spark.plans.mining import bpe_vocab
    from syslog_kafka_spark.session import get_spark

    spark = get_spark("fit-bpe-wide")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    base = [(r.word, r.freq) for r in bpe_vocab(d).collect()]
    wide = widen_vocab(base, args.perms)
    print(f"widened vocab: {len(base)} -> {len(wide)} words", flush=True)

    t0 = time.perf_counter()
    merges = local_bpe_fit(wide, 0)
    print(
        f"fit {len(merges)} merges to convergence in "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    out = os.path.join(REPO, "syslog_kafka_spark", "operators", "bpe_wide_frozen.py")
    with open(out, "w") as fh:
        fh.write(
            '"""FROZEN wide BPE merge table — GENERATED FILE.\n\n'
            f"Derived by scripts/fit_bpe_wide.py ({len(merges)} merges to\n"
            f"convergence on {args.sf_dir} widened by WIDE_PERMS={args.perms}\n"
            "affine letter-permutations — operators/bpe_wide.widen_vocab).\n"
            "Every rank genuinely fires on its vocab; the probe's\n"
            "production-count encode numbers cite this table. Regenerate\n"
            'with the script; never hand-edit."""\n\n'
            f"WIDE_PERMS: int = {args.perms}\n"
            f'WIDE_SF_DIR: str = "{args.sf_dir}"\n\n'
            "# rank-ordered (first merge applies first, exactly as trained)\n"
            f"BPE_MERGES_WIDE: list[tuple[str, str]] = {merges!r}\n"
        )
    print(f"wrote {out} ({len(merges)} merges)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
