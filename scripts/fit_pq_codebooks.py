"""Regenerate syslog_kafka_spark/operators/pq_frozen.py.

Product-quantization codebooks for the compression audit
(llm_pq_quantization_audit): the 64-dim embedding splits into 8
contiguous 8-dim subspaces, each with a 16-entry L2 k-means codebook —
the standard PQ8x16 layout (8 bytes per vector, 32x compression over
float32). Same pretrained-constant pattern as fit_ann_structures.py:
fit ONCE offline on the committed test corpus, freeze as 6-dp literals,
and the production pass becomes a pure function of the data that Spark
and DuckDB both compute and hash-compare.

L2 (not cosine) k-means on purpose: PQ reconstructs subvectors, so the
objective is squared reconstruction error — normalizing centroids (the
IVF fit's cosine trick) would bias every codeword onto the unit sphere
of the SUBSPACE, which real subvectors do not occupy.

Usage: python scripts/fit_pq_codebooks.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
N_SUBSPACES = 8
SUB_DIM = DIM // N_SUBSPACES
N_CODES = 16
SEED = 7
OUT = os.path.join(REPO, "syslog_kafka_spark", "operators", "pq_frozen.py")


def l2_kmeans(samples: np.ndarray, k: int, iters: int = 20, seed: int = 0) -> np.ndarray:
    """Plain Lloyd's k-means under squared-L2 (no normalization)."""
    rng = np.random.default_rng(seed)
    centroids = samples[rng.choice(len(samples), size=k, replace=False)].astype(
        np.float64
    )
    for _ in range(iters):
        d2 = ((samples[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = samples[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    path = os.path.join(sf_dir, "embeddings.parquet")
    X = np.array(
        duckdb.sql(f"SELECT embedding FROM read_parquet('{path}')")
        .fetchnumpy()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    assert X.shape[1] == DIM, X.shape
    books = []
    for s in range(N_SUBSPACES):
        sub = X[:, s * SUB_DIM : (s + 1) * SUB_DIM]
        cb = l2_kmeans(sub, N_CODES, iters=20, seed=SEED + s)
        books.append(np.round(cb, 6))

    lines = [
        '"""Frozen product-quantization codebooks (GENERATED — do not edit).',
        "",
        f"Fit by scripts/fit_pq_codebooks.py on {sf_dir} embeddings:",
        f"{N_SUBSPACES} subspaces x {N_CODES} codes x {SUB_DIM} dims, L2 k-means,",
        "rounded to 6 decimals — the rounded literals ARE the structure; both",
        'engines consume identical values, so rounding cannot diverge."""',
        "",
        "from __future__ import annotations",
        "",
        f"PQ_SUBSPACES = {N_SUBSPACES}",
        f"PQ_SUB_DIM = {SUB_DIM}",
        f"PQ_CODES = {N_CODES}",
        "",
        "PQ_CODEBOOKS: tuple[tuple[tuple[float, ...], ...], ...] = (",
    ]
    for cb in books:
        lines.append("    (")
        for row in cb:
            lines.append(
                "        (" + ", ".join(f"{v:.6f}" for v in row) + "),"
            )
        lines.append("    ),")
    lines.append(")")
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
