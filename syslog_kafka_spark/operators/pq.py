"""Product-quantization encode + reconstruction-error kernel.

PQ is the workhorse ANN compression at 100 TB: a 64-dim float32 vector
(256 bytes) becomes 8 one-byte codes (32x), and distance computations
against the codebooks stay accurate enough for recall-heavy retrieval.
This module encodes against the FROZEN committed codebooks
(operators/pq_frozen.py, fit by scripts/fit_pq_codebooks.py) so the
whole pass is a pure function of the data — DuckDB-oracle-checkable.

Bit-parity contract (the r6 frozen-structure rule): each code distance
is a LEFT-ASSOCIATED double sum of (x_i - c_i)^2 terms over the
subspace's 8 dims. The kernel accumulates one dimension at a time
(vectorized over rows), the SQL twin emits the same explicit `+` chain,
and float32 inputs promote to float64 exactly on both engines — so
distances, argmin codes, and errors are bit-identical cross-engine.
Squares are d*d (not pow) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from syslog_kafka_spark.operators.pq_frozen import (
    PQ_CODEBOOKS,
    PQ_CODES,
    PQ_SUB_DIM,
    PQ_SUBSPACES,
)


def pq_encode_arrow(df: DataFrame, emb_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, subspace, code, err) — 8 rows per vector — via a mapInArrow
    kernel: vectors cross Arrow once, distances accumulate per-dimension
    over numpy rows (the per-BLOCK shape; a per-pair/per-row Python loop
    would ship the same data at ~100x the interpreter cost)."""
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(id_col)
            ids_py = ids.to_pylist()
            X = np.array(batch.column(emb_col).to_pylist(), dtype=np.float64)
            n = len(X)
            out_s, out_code, out_err = [], [], []
            for s in range(PQ_SUBSPACES) if n else []:
                sub = X[:, s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM]
                D = np.empty((n, PQ_CODES), dtype=np.float64)
                for c in range(PQ_CODES):
                    cb = PQ_CODEBOOKS[s][c]
                    d0 = sub[:, 0] - cb[0]
                    acc = d0 * d0
                    for i in range(1, PQ_SUB_DIM):
                        di = sub[:, i] - cb[i]
                        acc = acc + di * di
                    D[:, c] = acc
                codes = D.argmin(axis=1)  # ties -> first, like the SQL twin
                errs = D[np.arange(n), codes]
                out_s.append(np.full(n, s, dtype=np.int32))
                out_code.append(codes.astype(np.int32))
                out_err.append(errs)
            yield pa.RecordBatch.from_arrays(
                [
                    # block order is s = 0..7, each block carrying all ids
                    pa.array(ids_py * PQ_SUBSPACES if n else [], ids.type),
                    pa.array(
                        np.concatenate(out_s) if out_s else [], pa.int32()
                    ),
                    pa.array(
                        np.concatenate(out_code) if out_code else [], pa.int32()
                    ),
                    pa.array(
                        np.concatenate(out_err) if out_err else [], pa.float64()
                    ),
                ],
                [id_col, "subspace", "code", "err"],
            )

    return df.mapInArrow(
        kernel,
        f"{id_col} {id_type}, subspace int, code int, err double",
    )


def pq_dist_sql(subspace: int, code: int, vec: str = "embedding") -> str:
    """DuckDB twin of one code distance: the explicit left-associated
    chain of (CAST(vec[i] AS DOUBLE) - <literal>) squares."""
    off = subspace * PQ_SUB_DIM
    terms = " + ".join(
        f"((CAST({vec}[{off + i + 1}] AS DOUBLE) - CAST({PQ_CODEBOOKS[subspace][code][i]!r} AS DOUBLE))"
        f" * (CAST({vec}[{off + i + 1}] AS DOUBLE) - CAST({PQ_CODEBOOKS[subspace][code][i]!r} AS DOUBLE)))"
        for i in range(PQ_SUB_DIM)
    )
    return f"({terms})"


def pq_dists_sql(subspace: int, vec: str = "embedding") -> str:
    """DuckDB list literal of all code distances for one subspace."""
    return (
        "["
        + ", ".join(pq_dist_sql(subspace, c, vec) for c in range(PQ_CODES))
        + "]"
    )


def ivf_pq_index_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, list_id, codes) — the full IVF-PQ index build in ONE kernel
    pass: coarse-quantizer assignment (per-dimension dot accumulation,
    bit-matching frozen_cluster_sims_sql's chains — the frozen_sims_udf
    pattern) plus the PQ code per subspace (the pq_encode loop). This is
    THE index layout FAISS-style engines persist at 100 TB: 4 bytes of
    list id + 8 bytes of codes per vector, built in one scan, written
    partitioned by list_id."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    n_lists, dim = C.shape
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(id_col)
            X = np.array(batch.column(emb_col).to_pylist(), dtype=np.float64)
            n = len(X)
            if n:
                sims = np.zeros((n_lists, n), dtype=np.float64)
                for c in range(n_lists):
                    for i in range(dim):  # sequential: matches the SQL chains
                        sims[c] = sims[c] + X[:, i] * C[c, i]
                list_id = sims.argmax(axis=0).astype(np.int32)  # first-max ties
                codes = np.empty((n, PQ_SUBSPACES), dtype=np.int32)
                for s in range(PQ_SUBSPACES):
                    sub = X[:, s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM]
                    D = np.empty((n, PQ_CODES), dtype=np.float64)
                    for c in range(PQ_CODES):
                        cb = PQ_CODEBOOKS[s][c]
                        d0 = sub[:, 0] - cb[0]
                        acc = d0 * d0
                        for i in range(1, PQ_SUB_DIM):
                            di = sub[:, i] - cb[i]
                            acc = acc + di * di
                        D[:, c] = acc
                    codes[:, s] = D.argmin(axis=1)
                codes_arr = pa.array(codes.tolist(), pa.list_(pa.int32()))
                lists_arr = pa.array(list_id, pa.int32())
            else:
                codes_arr = pa.array([], pa.list_(pa.int32()))
                lists_arr = pa.array([], pa.int32())
            yield pa.RecordBatch.from_arrays(
                [ids, lists_arr, codes_arr], [id_col, "list_id", "codes"]
            )

    return df.mapInArrow(
        kernel, f"{id_col} {id_type}, list_id int, codes array<int>"
    )


def pq_query_lut_arrow(
    df: DataFrame, emb_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, lut) — the per-query ADC lookup table: lut[s][c] = squared L2
    distance from the query's subvector s to codeword c, the SAME
    left-associated per-dimension accumulation the encode kernel and the
    SQL chains use, so every table entry is bit-identical cross-engine.
    8x16 doubles per query; scoring a candidate is then 8 array lookups
    — the asymmetric-distance trick that makes PQ search fast: the
    corpus is never decoded."""
    import numpy as np

    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(id_col)
            X = np.array(batch.column(emb_col).to_pylist(), dtype=np.float64)
            n = len(X)
            luts = []
            for r in range(n):
                lut = []
                for s in range(PQ_SUBSPACES):
                    sub = X[r, s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM]
                    row = []
                    for c in range(PQ_CODES):
                        cb = PQ_CODEBOOKS[s][c]
                        d0 = sub[0] - cb[0]
                        acc = d0 * d0
                        for i in range(1, PQ_SUB_DIM):
                            di = sub[i] - cb[i]
                            acc = acc + di * di
                        row.append(acc)
                    lut.append(row)
                luts.append(lut)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(luts, pa.list_(pa.list_(pa.float64())))],
                [id_col, "lut"],
            )

    return df.mapInArrow(
        kernel, f"{id_col} {id_type}, lut array<array<double>>"
    )
