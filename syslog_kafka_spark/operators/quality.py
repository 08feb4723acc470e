"""Scan-local scoring kernel for the frozen hashed-BoW quality
classifier (operators/quality_frozen.py).

The batch gate (llm_hashed_quality_classifier) scores via the
relational plan — token explode, (doc, bucket) aggregate, broadcast
weight join — which is the right shape when the corpus is already being
shuffled for other reasons. This kernel is the OTHER production shape:
each document scores entirely inside its scan task (hash tokens, fold
weights, one double out), zero shuffle, which is what an ingest stream
or a pure filtering pass wants at 100 TB. Tokenization stays a Spark
expression (functions/text.tokens) so string semantics are identical to
the batch plan and the oracle; the kernel only hashes and folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from syslog_kafka_spark.operators.quality_frozen import (
    QF_BIAS,
    QF_BUCKETS,
    QF_WEIGHTS,
)


def quality_z_arrow(df: DataFrame, toks_col: str = "toks", id_col: str = "doc_id") -> DataFrame:
    """(id, z) — the classifier's pre-sigmoid logit per document, from a
    (id, token-array) frame: bucket = hash64(token, 'hq-v1') mod 4096,
    z = Σ w[bucket]·tf + bias, folded locally in bucket-sorted order
    (deterministic within Spark; cross-engine parity is by 6-dp score
    rounding, as in the batch plan — weight sums are order-sensitive at
    the last ulp on any engine pair). Sigmoid + rounding stay Spark
    expressions (JVM HALF_UP — numpy rounds half-even, the r6 trap)."""
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        W = np.asarray(QF_WEIGHTS, dtype=np.float64)
        memo: dict[str, int] = {}
        MEMO_CAP = 1 << 20

        def bucket(t: str) -> int:
            b = memo.get(t)
            if b is None:
                b = int(hashlib.md5((t + "hq-v1").encode("utf-8")).hexdigest()[:15], 16) % QF_BUCKETS
                if len(memo) < MEMO_CAP:
                    memo[t] = b
            return b

        for batch in batches:
            ids = batch.column(id_col)
            toks = batch.column(toks_col).to_pylist()
            zs = np.full(len(toks), float(QF_BIAS), dtype=np.float64)
            for r, tl in enumerate(toks):
                if not tl:
                    continue
                bs = np.fromiter((bucket(t) for t in tl), dtype=np.int64, count=len(tl))
                ub, cnt = np.unique(bs, return_counts=True)  # bucket-sorted
                # Explicit left-to-right fold over the bucket-sorted terms
                # (np.sum is PAIRWISE summation — a different rounding path
                # that could land the odd z on the other side of a 5e-7
                # boundary from the documented sequential convention).
                # Cross-SHAPE parity with the relational plan's partial
                # aggregate remains by 6-dp rounding, as documented below.
                terms = W[ub] * (cnt.astype(np.float64) / len(tl))
                acc = float(QF_BIAS)
                for v in terms.tolist():
                    acc += v
                zs[r] = acc
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(zs, pa.float64())], [id_col, "z"]
            )

    return df.mapInArrow(kernel, f"{id_col} {id_type}, z double")
