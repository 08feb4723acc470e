"""AQE skew-join handling, demonstrated on a real skewed join.

session.py enables spark.sql.adaptive.skewJoin for the 100 TB case; this
test proves the mechanism actually engages: a sort-merge join where one
key owns ~99% of the probe side gets its oversized partition SPLIT at
runtime (the `skew=true` marker in the adaptive plan), with thresholds
scaled down so the behavior is observable on test-sized data.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join_partition(spark):
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # scale thresholds down so a ~MB hot partition counts as skewed,
        # and disable broadcast so the join stays sort-merge (the skew
        # splitter only applies there)
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        hot = spark.range(200_000).select(
            F.lit(7).alias("k"), F.concat(F.lit("payload-"), F.col("id")).alias("v")
        )
        cold = spark.range(1000).select(
            (F.col("id") % 97 + 100).alias("k"),
            F.concat(F.lit("cold-"), F.col("id")).alias("v"),
        )
        probe = hot.unionAll(cold)
        build = spark.range(300).select(
            F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("d")
        )

        joined = probe.join(build, "k")
        # collect() executes THIS dataframe's own query execution, which
        # is the one whose adaptive plan we inspect below (count()/write
        # would run a separate execution and leave this one non-final)
        rows = joined.collect()
        assert len(rows) == 200_000 + cold.join(build, "k").count()

        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, (
            "AQE skew-join did not engage:\n" + final_plan[:2000]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
