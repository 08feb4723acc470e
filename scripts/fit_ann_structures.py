"""Regenerate syslog_kafka_spark/operators/ann_frozen.py.

Hash-gating the two ANN queries (llm_ann_srp_topk / llm_ann_ivf_topk)
requires their trained/derived structures to be pure committed constants
— the same pretrained pattern as operators/semdedup_centroids.py: fit or
derive ONCE offline, freeze as literals, and the production pass becomes
a pure function of the data that Spark and DuckDB can both compute and
hash-compare.

Two structures:
- SRP_PLANES: signed-random-projection hyperplanes, shape
  (N_TABLES, N_PLANES, DIM), drawn from a seeded generator and
  rounded to 6 decimals (the rounded literals ARE the frozen structure;
  both engines consume identical values, so rounding cannot diverge).
- IVF_CENTROIDS: k-means coarse-quantizer centroids (N_LISTS x DIM),
  fit exactly like scripts/fit_semdedup_centroids.py but with
  N_LISTS=16 lists, unit-normalized, full precision.

Usage: python scripts/fit_ann_structures.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from syslog_kafka_spark.operators.similarity import _kmeans_centroids  # noqa: E402

DIM = 64
N_TABLES = 8
N_PLANES = 4
N_LISTS = 16
SEED = 42
OUT = os.path.join(REPO, "syslog_kafka_spark", "operators", "ann_frozen.py")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    rng = np.random.default_rng(SEED)
    planes = np.round(rng.standard_normal((N_TABLES, N_PLANES, DIM)), 6)

    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    mat = mat[rng.permutation(len(mat))]
    centroids = _kmeans_centroids(mat, N_LISTS, seed=SEED)

    lines = [
        '"""FROZEN ANN structures — GENERATED FILE.',
        "",
        f"Derived by scripts/fit_ann_structures.py (seed={SEED}; IVF centroids",
        f"fit on {sf_dir} embeddings, unit-normalized numpy k-means; SRP",
        "planes seeded-gaussian, rounded to 6 decimals). Frozen so the",
        "llm_ann_srp_topk / llm_ann_ivf_topk gates are pure functions both",
        "engines hash-compare: Spark computes sign-bits / argmax via the same",
        "left-associated double folds the generated DuckDB SQL evaluates.",
        "Regenerate with the script; never hand-edit.",
        '"""',
        "",
        f"DIM = {DIM}",
        f"N_TABLES = {N_TABLES}",
        f"N_PLANES = {N_PLANES}",
        f"N_LISTS = {N_LISTS}",
        "",
        "# (N_TABLES, N_PLANES, DIM) signed-random-projection hyperplanes",
        "SRP_PLANES: list[list[list[float]]] = [",
    ]
    for tbl in planes:
        lines.append("    [")
        for p in tbl:
            lines.append("        [" + ", ".join(repr(float(x)) for x in p) + "],")
        lines.append("    ],")
    lines.append("]")
    lines.append("")
    lines.append("# (N_LISTS, DIM) IVF coarse-quantizer centroids (unit-norm)")
    lines.append("IVF_CENTROIDS: list[list[float]] = [")
    for c in centroids:
        lines.append("    [" + ", ".join(repr(float(x)) for x in c) + "],")
    lines.append("]")
    lines.append("")
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {OUT}: planes {planes.shape}, centroids {centroids.shape}")


if __name__ == "__main__":
    main()
