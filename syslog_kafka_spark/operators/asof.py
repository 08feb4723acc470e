"""As-of join: for each left row, the latest right row at-or-before it.

Spark has no built-in ASOF JOIN (DuckDB does). The naive formulation —
equi-join on the key, filter right_ts <= left_ts, rank, keep rn=1 —
materializes every (left, right) pair per key before pruning: O(L*R) per
key, which detonates on hot keys at 100 TB.

This implementation is the merge formulation instead:

1. union the two sides, tagged (side=0 right, side=1 left)
2. one shuffle: window partitioned by key, ordered by (ts, side, tiebreak)
3. last(value, ignorenulls=True) over rows UNBOUNDED PRECEDING..CURRENT
   carries the most recent right value forward to each left row

Cost: one shuffle + one sort, linear output. Ordering puts right rows
before left rows at equal ts (side 0 < 1), so "at-or-before" includes
exact-ts matches; among equal-ts right rows the largest tiebreak wins,
matching ORDER BY ts DESC, tiebreak DESC ... rn=1 in the rank form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join_last(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    value_alias: str = "asof_value",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Return ``left`` with ``value_alias`` = latest ``right_value`` whose
    ``right_ts`` <= the row's ``left_ts`` within the same ``on`` key
    (null when no right row precedes it).

    ``right_value`` must be orderable — it doubles as the deterministic
    tie-break among right rows sharing a timestamp (largest wins).

    ``tolerance_sec`` bounds the match window (pandas ``merge_asof``
    tolerance semantics): a preceding right row older than the tolerance
    yields null instead. The matched row's timestamp rides along in one
    struct with its value, so the bound always checks the timestamp of
    the row that supplied the value — never a fresher unmatched one.
    """
    left_cols = [c for c in left.columns]

    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("_v"),
        F.struct(*left_cols).alias("_row"),
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_value).alias("_v"),
        F.lit(None).cast(tagged_left.schema["_row"].dataType).alias("_row"),
    )

    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_v").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    merged = tagged_right.unionByName(tagged_left)
    if tolerance_sec is None:
        merged = merged.withColumn(value_alias, F.last("_v", ignorenulls=True).over(w))
    else:
        # Carry only right rows whose value is non-null, matching the
        # non-tolerance branch: last(_v, ignorenulls) skips null-valued
        # right rows and falls back to the previous one, so the tolerance
        # struct must skip them too or the two branches diverge.
        carry = F.when(
            (F.col("_side") == 0) & F.col("_v").isNotNull(),
            F.struct(F.col("_ts").alias("rts"), F.col("_v").alias("v")),
        )
        merged = merged.withColumn("_m", F.last(carry, ignorenulls=True).over(w)).withColumn(
            value_alias,
            F.when(
                F.expr("unix_micros(_ts) - unix_micros(_m.rts)")
                <= F.lit(int(tolerance_sec) * 1_000_000),
                F.col("_m.v"),
            ),
        )
    return merged.filter(F.col("_side") == 1).select("_row.*", value_alias)


def asof_join_next(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    value_alias: str = "asof_value",
) -> DataFrame:
    """Forward as-of: ``value_alias`` = earliest ``right_value`` whose
    ``right_ts`` >= the row's ``left_ts`` within the same key (null when
    no right row follows). Same merge formulation as
    :func:`asof_join_last`, traversed in descending time: right rows sort
    before left at equal ts (at-or-after includes exact matches), and
    equal-ts right rows sort descending by value so the carried "last
    seen" is the smallest — mirroring ORDER BY ts ASC, value ASC rn=1."""
    left_cols = [c for c in left.columns]

    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("_v"),
        F.struct(*left_cols).alias("_row"),
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_value).alias("_v"),
        F.lit(None).cast(tagged_left.schema["_row"].dataType).alias("_row"),
    )

    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").desc(), F.col("_side").asc(), F.col("_v").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    merged = tagged_right.unionByName(tagged_left).withColumn(
        value_alias, F.last("_v", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("_side") == 1).select("_row.*", value_alias)
