"""Generate a deterministic sf1 dataset (10x sf0.1) for scale benchmarking.

The driver ships sf{0.001,0.01,0.1} only; proving the ~linear scale story
(VERDICT r3 item 5) needs one decade more data. This script derives sf1
from sf0.1 by REPLICA x KEY-OFFSET expansion — no new randomness enters the
data distribution, so per-query work should scale with row count:

- Dimension tables (region, nation) are copied verbatim: at any scale the
  dim side of a star join stays broadcast-able.
- Fact/entity tables are cross-joined with replica ids 0..9; every key
  column (primary and foreign) is offset by ``replica * OFFSET`` so
  referential integrity holds within each replica and key populations are
  disjoint across replicas (selectivities per key are preserved).
- ``documents.text``: replica 0 is verbatim; replicas 1..9 pass through a
  per-replica Caesar cipher on ASCII letters (shift by replica, case
  preserved). The map is injective and text-deterministic, so WITHIN a
  replica every relationship is preserved exactly — duplicate groups,
  word lengths, token frequency shape, n_chars — giving exact-dedup 10x
  the dupes, matching a real crawl's duplication growth. ACROSS replicas
  the vocabulary is disjoint, so bag-of-words features (SimHash), char
  shingles (MinHash/Jaccard), and n-grams all diverge: each replica is
  its own near-dup universe and pair counts grow ~linearly. (A plain
  word-order permutation was tried first and failed exactly there:
  permutation preserves bag-of-words, cross-replica SimHash signatures
  collided, and bucket pair counts grew quadratically.)
- ``embeddings.embedding``: replica 0 verbatim; replicas 1..9 add seeded
  N(0, 0.05) noise per (vec_id, replica). Preserves the cluster structure
  (labels keep their centroids) without creating 10-way exact ties in
  similarity top-k.

Output: $SPARK_GRAFT_SF1_DIR (default /root/repo/.bench/sf1), one
``<table>.parquet`` directory per table, loadable by the same
``load_tables`` path the inventory uses. Deterministic end-to-end: seeds
derive from data + replica only.

Usage: python scripts/make_sf1.py [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import string
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
# Above every key range in sf0.1 (max is o_orderkey < 1e6) and far below
# int64 overflow at replica 9.
OFFSET = 100_000_000

# table -> key columns to offset (all BIGINT in the source schema).
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def _cipher_table(shift: int) -> dict[int, int]:
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    return str.maketrans(
        lower + upper,
        lower[shift:] + lower[:shift] + upper[shift:] + upper[:shift],
    )


def _perm_table(replica: int) -> dict[int, int]:
    """Seeded random letter permutation for replicas >= 10: a Caesar shift
    of r % 26 collides back to the identity at r = 26/52/78, which would
    make those replicas exact cross-replica duplicates of replica 0 and
    bend dedup pair counts superlinear. Distinct seeded permutations keep
    every replica's vocabulary disjoint with near-certainty at any
    replica count, preserving the ~linear pair-growth property sf1 has.
    Replicas 1..9 keep the original shift cipher so sf1 regenerates
    byte-identically."""
    import numpy as np

    rng = np.random.default_rng(10_000 + replica)
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    perm = rng.permutation(26)
    return str.maketrans(
        lower + upper,
        "".join(lower[i] for i in perm) + "".join(upper[i] for i in perm),
    )


def _cipher_documents(pdf_iter, n_replicas):
    """mapInPandas worker: explode each doc into n_replicas rows.

    Replica 0 keeps the text verbatim; replica r>0 applies a Caesar shift
    of r to every ASCII letter — injective and text-deterministic, so
    identical texts stay identical within a replica while no replica
    shares vocabulary with another (see module docstring).
    """
    tables = {
        r: _cipher_table(r) if r < 10 else _perm_table(r)
        for r in range(1, n_replicas)
    }
    for pdf in pdf_iter:
        out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
        for doc_id, text, lang, source, n_chars in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"], pdf["n_chars"]
        ):
            for r in range(n_replicas):
                new_text = text if r == 0 else text.translate(tables[r])
                out["doc_id"].append(int(doc_id) + r * OFFSET)
                out["text"].append(new_text)
                out["lang"].append(lang)
                out["source"].append(source)
                out["n_chars"].append(int(n_chars))
        yield pd.DataFrame(out)


def _perturb_embeddings(pdf_iter, n_replicas):
    """mapInPandas worker: explode each vector into n_replicas rows with
    seeded gaussian noise (sigma=0.05) on replicas >0."""
    for pdf in pdf_iter:
        out = {"vec_id": [], "embedding": [], "label": []}
        for vec_id, emb, label in zip(pdf["vec_id"], pdf["embedding"], pdf["label"]):
            base = np.asarray(emb, dtype=np.float32)
            for r in range(n_replicas):
                if r == 0:
                    vec = base
                else:
                    rng = np.random.RandomState((int(vec_id) * 131 + r) & 0xFFFFFFFF)
                    vec = base + rng.normal(0.0, 0.05, base.shape).astype(np.float32)
                out["vec_id"].append(int(vec_id) + r * OFFSET)
                out["embedding"].append(vec.astype(np.float32))
                out["label"].append(label)
        yield pd.DataFrame(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--tables", default=None, help="comma-separated subset to regenerate")
    ap.add_argument(
        "--out", default=os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.bench/sf1")
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from syslog_kafka_spark.session import get_spark

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    replicas = spark.range(args.replicas).withColumnRenamed("id", "_r")

    subset = set(args.tables.split(",")) if args.tables else None
    for t in DIMS:
        if subset is not None and t not in subset:
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: copied {df.count()} rows")

    for t, keys in KEYED.items():
        if subset is not None and t not in subset:
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t == "documents":
            out = df.repartition(32).mapInPandas(
                lambda it, n=args.replicas: _cipher_documents(it, n),
                schema=df.schema,
            )
        elif t == "embeddings":
            out = df.repartition(32).mapInPandas(
                lambda it, n=args.replicas: _perturb_embeddings(it, n),
                schema=df.schema,
            )
        else:
            out = df.crossJoin(replicas)
            for k in keys:
                out = out.withColumn(k, F.col(k) + F.col("_r") * F.lit(OFFSET))
            out = out.drop("_r")
        out.repartition(32).write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        n = spark.read.parquet(f"{args.out}/{t}.parquet").count()
        print(f"{t}: wrote {n} rows")
    print(f"sf1 dataset at {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
