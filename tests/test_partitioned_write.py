"""Partitioned parquet writes + partition pruning: the layout discipline
that makes a 100 TB table queryable.

At scale, event/log tables are written `partitionBy` a coarse time (and
sometimes category) key so that time-ranged queries touch only the
matching directories. These tests prove both halves on real files: the
writer produces the hive-style layout, and Catalyst prunes the read back
to the selected partitions (visible as PartitionFilters in the scan,
distinct from row-group PushedFilters).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from syslog_kafka_spark.sources.readers import load_tables


def _scan_line(plan: str, tag: str) -> str:
    return next(l for l in plan.splitlines() if tag in l)


def _formatted_plan(df) -> str:
    jexec = df._jdf.queryExecution()
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jexec.explainString(mode)


def test_partitioned_write_layout_and_pruning(spark, sf_dir, tmp_path):
    orders = load_tables(spark, sf_dir).orders
    out = str(tmp_path / "orders_by_month")
    monthly = orders.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
    monthly.write.partitionBy("order_month").parquet(out)

    # hive-style directory layout, one dir per month
    months = sorted(d for d in os.listdir(out) if d.startswith("order_month="))
    assert len(months) >= 2 and months[0].startswith("order_month=1995")

    back = spark.read.parquet(out).filter(F.col("order_month") == "1995-03")
    plan = _formatted_plan(back)
    pf = _scan_line(plan, "PartitionFilters")
    assert "order_month" in pf and "1995-03" in pf, "partition filter not pruned at scan"

    # pruning is semantic, not cosmetic: counts match a full-scan filter
    expected = orders.filter(F.date_format("o_orderdate", "yyyy-MM") == "1995-03").count()
    assert back.count() == expected and expected > 0


def test_partition_pruning_composes_with_rowgroup_pushdown(spark, sf_dir, tmp_path):
    orders = load_tables(spark, sf_dir).orders
    out = str(tmp_path / "orders_by_status")
    orders.withColumn("status", F.col("o_orderstatus")).write.partitionBy(
        "status"
    ).parquet(out)

    back = (
        spark.read.parquet(out)
        .filter((F.col("status") == "F") & (F.col("o_totalprice") > 100000.0))
        .select("o_orderkey")
    )
    plan = _formatted_plan(back)
    assert "status" in _scan_line(plan, "PartitionFilters")
    assert "o_totalprice" in _scan_line(plan, "PushedFilters"), (
        "row-group filter must still push down under partition pruning"
    )
    read_schema = _scan_line(plan, "ReadSchema")
    assert "o_orderdate" not in read_schema, "column pruning lost under partitioning"
