"""Bucketed-table helpers: co-located fact-fact joins without shuffles.

At 100 TB the dominant cost of orders ⋈ lineitem is the shuffle of both
facts on the join key. Writing both tables bucketed (and sorted) by that
key pins co-partitioning at storage time: the sort-merge join then reads
matching buckets directly — zero Exchange in the plan, verified by test.

This is the storage-layout contract a production deployment would adopt
for its hot join keys; the helper exists so pipelines (and tests) express
it declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str,
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_by)
    if sort:
        writer = writer.sortBy(bucket_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
