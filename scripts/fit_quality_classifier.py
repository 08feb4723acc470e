"""Regenerate syslog_kafka_spark/operators/quality_frozen.py.

A fastText-style linear quality classifier over hashed bag-of-words —
the model-based filtering stage of a modern curation pipeline
(FineWeb-edu / CCNet style), distilled here from the repo's own
deterministic quality heuristic so the whole path stays a pure function
of the data: label = (mean_token_len >= 5.5), computed on the 4-dp
ROUNDED feature (the pinned-threshold rule). The label is one-sided on
purpose: mean token length is LINEAR in term frequencies (sum of
tf_t * len(t)), so a linear model can genuinely learn it through hash
collisions — an interval label (the first attempt) is not linearly
separable and trains to the base rate. Features = per-document term
frequencies hashed into
``N_BUCKETS`` buckets with the house hash64, weights = full-batch
logistic regression (deterministic: zero init, fixed iterations, fixed
learning rate), frozen at 6 dp.

Same pretrained-constant pattern as fit_ann_structures.py /
fit_pq_codebooks.py: fit ONCE offline on the committed corpus, freeze
as literals, and production scoring is oracle-checkable cross-engine.

Usage: python scripts/fit_quality_classifier.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BUCKETS = 4096
ITERS = 3000
LR = 50.0
OUT = os.path.join(REPO, "syslog_kafka_spark", "operators", "quality_frozen.py")


def hash64(s: str, salt: str = "") -> int:
    return int(hashlib.md5((s + salt).encode("utf-8")).hexdigest()[:15], 16)


def toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t != ""]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    path = os.path.join(sf_dir, "documents.parquet")
    rows = duckdb.sql(f"SELECT doc_id, text FROM read_parquet('{path}')").fetchall()

    X = np.zeros((len(rows), N_BUCKETS), dtype=np.float64)
    y = np.zeros(len(rows), dtype=np.float64)
    for r, (_doc_id, text) in enumerate(rows):
        tl = toks(text)
        n = len(tl)
        n_chars = len(text)
        mean_tok = round(n_chars / n, 4) if n > 0 else 0.0
        y[r] = 1.0 if mean_tok >= 5.5 else 0.0
        for t in tl:
            X[r, hash64(t, "hq-v1") % N_BUCKETS] += 1.0
        if n:
            X[r] /= n

    w = np.zeros(N_BUCKETS)
    b = 0.0
    for _ in range(ITERS):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (X.T @ g) / len(rows)
        b -= LR * g.mean()
    p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    acc = ((p >= 0.5) == (y == 1.0)).mean()
    print(f"train accuracy: {acc:.4f}  positives: {y.mean():.4f}")

    w = np.round(w, 6)
    b = round(float(b), 6)
    lines = [
        '"""Frozen hashed-BoW quality classifier (GENERATED — do not edit).',
        "",
        f"Fit by scripts/fit_quality_classifier.py on {sf_dir} documents:",
        f"{N_BUCKETS}-bucket hashed term frequencies -> logistic regression",
        f"({ITERS} full-batch iterations, lr {LR}), train accuracy {acc:.4f}",
        "against the deterministic heuristic label. 6-dp literals — both",
        'engines consume identical values."""',
        "",
        "from __future__ import annotations",
        "",
        f"QF_BUCKETS = {N_BUCKETS}",
        f"QF_BIAS = {b!r}",
        "",
        "QF_WEIGHTS: tuple[float, ...] = (",
    ]
    for i in range(0, N_BUCKETS, 8):
        lines.append(
            "    " + " ".join(f"{v:.6f}," for v in w[i : i + 8])
        )
    lines.append(")")
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
