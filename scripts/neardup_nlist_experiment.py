"""The √N-nlist rule, demonstrated: re-fitting the coarse quantizer
restores ~linear blocked near-dup cost at 10× the corpus.

llm_embedding_neardup_blocked keys its per-block kernel on
(label × frozen-IVF-list). The FROZEN 16-list quantizer cannot grow with
the corpus (it must stay frozen for the DuckDB oracle), so the r9 sf10
probe still shows a residual quadratic: block populations grow ~N/256
and the warm sf1→sf10 ratio measured 14.1× (vs the label-only tier's
108.9×). The deployment story — FAISS's nlist ≈ √N rule — says a 10×
corpus re-fits to ~√10 ≈ 3.2× more lists, holding per-block occupancy
(and so per-block all-pairs work) ~constant.

This script MEASURES that claim instead of asserting it: it fits a
64-list quantizer on a bounded sf10 sample (the same offline
_kmeans_centroids the frozen 16-list index came from), runs the
identical blocked-pair kernel on sf10 under both quantizers, and prints
the wall-clock + block-occupancy comparison. Not a gated query — the
refit centroids are data-derived per run, so no frozen oracle can pin
them; the gated tier stays the frozen-16 query, with this experiment
recorded in BENCH_SF10.md.

Usage: python scripts/neardup_nlist_experiment.py [--sf1 DIR] [--sf10 DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEED = 909
SAMPLE = 20000


def blocked_pairs_time(spark, sf_dir: str, centroids: list[list[float]], tag: str):
    import pyspark.sql.functions as F

    from syslog_kafka_spark.operators.similarity import (
        blocked_assignment,
        embedding_neardup_pairs,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # the SAME blk arithmetic the gated tiers run — the experiment must
    # measure the production assignment, not a hand-synced copy of it
    blocked = blocked_assignment(emb, centroids)
    occ = blocked.groupBy("blk").count().agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("count").alias("max_block"),
        F.avg("count").alias("mean_block"),
    ).collect()[0]
    out = {}
    for call in ("call1", "call2"):
        t0 = time.perf_counter()
        n_pairs = embedding_neardup_pairs(
            blocked, label_col="blk", threshold=0.4
        ).count()
        out[call] = round(time.perf_counter() - t0, 2)
        # cold/warm pair counts must agree — a disagreement means the
        # pipeline is nondeterministic and the timing is meaningless
        if "n_pairs" in out and out["n_pairs"] != n_pairs:
            raise AssertionError(
                f"{tag}: nondeterministic pair count "
                f"{out['n_pairs']} != {n_pairs}"
            )
        out["n_pairs"] = n_pairs
    out.update(
        n_blocks=occ["n_blocks"],
        max_block=occ["max_block"],
        mean_block=round(occ["mean_block"], 1),
    )
    print(f"{tag}: {out}", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default=os.path.join(REPO, ".bench", "sf1"))
    ap.add_argument("--sf10", default=os.path.join(REPO, ".bench", "sf10"))
    args = ap.parse_args()

    from syslog_kafka_spark.operators.ann_frozen import IVF_CENTROIDS
    from syslog_kafka_spark.operators.similarity import _kmeans_centroids
    from syslog_kafka_spark.session import get_spark

    spark = get_spark("neardup-nlist-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    # Offline re-fit on a bounded sample, exactly like the frozen index's
    # fit script — nlist 16 → 64 for the 10× corpus (√10 ≈ 3.2, rounded
    # up to the next power of two so label*nlist block ids stay readable).
    emb10 = spark.read.parquet(os.path.join(args.sf10, "embeddings.parquet"))
    sample = np.array(
        emb10.select("embedding")
        .orderBy("vec_id")
        .limit(SAMPLE)
        .rdd.map(lambda r: r[0])
        .collect(),
        dtype=np.float64,
    )
    refit64 = [
        [float(x) for x in row] for row in _kmeans_centroids(sample, 64, seed=SEED)
    ]

    spark.read.parquet(os.path.join(args.sf1, "embeddings.parquet")).count()  # warm
    r = {
        "sf1_nlist16": blocked_pairs_time(spark, args.sf1, IVF_CENTROIDS, "sf1 nlist=16"),
        "sf10_nlist16": blocked_pairs_time(spark, args.sf10, IVF_CENTROIDS, "sf10 nlist=16"),
        "sf10_nlist64": blocked_pairs_time(spark, args.sf10, refit64, "sf10 nlist=64 (refit)"),
    }
    frozen_ratio = round(r["sf10_nlist16"]["call2"] / r["sf1_nlist16"]["call2"], 2)
    refit_ratio = round(r["sf10_nlist64"]["call2"] / r["sf1_nlist16"]["call2"], 2)
    print(f"\nwarm sf1->sf10 ratio, frozen nlist=16: {frozen_ratio}x")
    print(f"warm sf1->sf10 ratio, refit  nlist=64: {refit_ratio}x")
    print(
        "max block occupancy: "
        f"sf1/16={r['sf1_nlist16']['max_block']}, "
        f"sf10/16={r['sf10_nlist16']['max_block']}, "
        f"sf10/64={r['sf10_nlist64']['max_block']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
