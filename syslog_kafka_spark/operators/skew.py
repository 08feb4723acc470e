"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; this operator is the explicit fallback for pathological keys —
e.g. one user_id owning 10% of a 100 TB event log, where a single task
would receive that entire key.

Mechanism: the skewed (probe) side gets a deterministic salt derived from
a unique column (pmod of a hash — reproducible, unlike rand()); the build
side is exploded ``buckets`` times so every (key, salt) bucket finds its
match. The join key becomes (key, salt): the hot key now spreads across
``buckets`` tasks. Build-side cost: x buckets rows — use only for the
keys that need it (split-and-union with a plain join for the rest).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    buckets: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` to ``small`` on ``on`` with ``buckets``-way salting.

    ``salt_source``: a column of ``skewed`` to derive the salt from
    (defaults to the join key itself combined with every row via
    monotonically_increasing_id — still deterministic per execution plan,
    but prefer passing a real unique column for replayable results).

    Only ``inner`` and left-flavored joins are allowed: the build side is
    exploded ``buckets`` times, so a right/full outer join would emit each
    unmatched build row once per bucket — silently wrong output.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: the "
            f"exploded build side would duplicate unmatched right rows {buckets}x"
        )
    src = F.col(salt_source) if salt_source else F.monotonically_increasing_id()
    left = skewed.withColumn("_salt", F.pmod(F.xxhash64(src), F.lit(buckets)).cast("int"))
    right = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    out = left.join(right, [on, "_salt"], how)
    return out.drop("_salt")
