"""Regenerate syslog_kafka_spark/operators/semdedup_centroids.py.

SemDeDup's coarse quantizer is a seeded k-means fit. To make the
`llm_semantic_dedup` query fully hash-gateable (Spark vs DuckDB), the
fitted centroids are FROZEN as literal constants — the standard
pretrained-quantizer pattern at warehouse scale (fit once offline on a
sample, apply everywhere). This script is the offline fit: numpy-only,
seeded, over the sf0.01 embeddings table (the driver's correctness-gate
scale factor), mirroring operators/similarity._kmeans_centroids.

Usage: python scripts/fit_semdedup_centroids.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from syslog_kafka_spark.operators.similarity import _kmeans_centroids  # noqa: E402

N_CLUSTERS = 8
SEED = 42
OUT = os.path.join(REPO, "syslog_kafka_spark", "operators", "semdedup_centroids.py")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    # Deterministic sample order: seeded shuffle of the id-ordered corpus
    # (the adaptive operator samples via orderBy(rand(seed)); frozen here).
    rng = np.random.default_rng(SEED)
    mat = mat[rng.permutation(len(mat))]
    centroids = _kmeans_centroids(mat, N_CLUSTERS, seed=SEED)

    lines = [
        '"""FROZEN SemDeDup coarse-quantizer centroids — GENERATED FILE.',
        "",
        f"Fit by scripts/fit_semdedup_centroids.py on {sf_dir} embeddings",
        f"(k={N_CLUSTERS}, seed={SEED}, unit-normalized, numpy k-means). Frozen so",
        "the llm_semantic_dedup gate is a pure function both engines can",
        "compute: Spark assigns argmax-dot via Column expressions, DuckDB via",
        "the generated SQL twin. Regenerate with the script; never hand-edit.",
        '"""',
        "",
        "DIM = %d" % centroids.shape[1],
        "",
        "CENTROIDS: list[list[float]] = [",
    ]
    for c in centroids:
        lines.append("    [" + ", ".join(repr(float(x)) for x in c) + "],")
    lines.append("]")
    lines.append("")
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {OUT}: {centroids.shape}")


if __name__ == "__main__":
    main()
