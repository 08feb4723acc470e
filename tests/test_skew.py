"""Salted-join correctness: identical results to the plain join, with the
join key widened to (key, salt)."""

from __future__ import annotations

import pyspark.sql.functions as F

from syslog_kafka_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + a long tail
    skewed = spark.createDataFrame(
        [(i, 1 if i % 10 else i) for i in range(1000)], ["row_id", "k"]
    )
    dim = spark.createDataFrame([(k, f"v{k}") for k in range(0, 1000, 10)] + [(1, "v1")], ["k", "v"])

    plain = {
        (r.row_id, r.v)
        for r in skewed.join(dim, "k").select("row_id", "v").collect()
    }
    salted = {
        (r.row_id, r.v)
        for r in salted_join(skewed, dim, "k", buckets=8, salt_source="row_id")
        .select("row_id", "v")
        .collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_join_rejects_right_and_full_outer(spark):
    # the exploded build side would emit unmatched right rows buckets× —
    # the operator must refuse rather than return silently wrong output
    import pytest

    skewed = spark.createDataFrame([(1, 1)], ["row_id", "k"])
    dim = spark.createDataFrame([(2, "v")], ["k", "v"])
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError):
            salted_join(skewed, dim, "k", how=how)
    # left join stays allowed: unmatched PROBE rows are not duplicated
    rows = salted_join(skewed, dim, "k", how="left", salt_source="row_id").collect()
    assert len(rows) == 1 and rows[0]["v"] is None


def test_salted_join_spreads_hot_key(spark):
    skewed = spark.createDataFrame([(i, 1) for i in range(100)], ["row_id", "k"])
    dim = spark.createDataFrame([(1, "hot")], ["k", "v"])
    out = salted_join(skewed, dim, "k", buckets=4, salt_source="row_id")
    # every skewed row still matches; the salt spread rows over >1 bucket
    assert out.count() == 100
    salts = (
        skewed.withColumn("_salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(4)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 1
