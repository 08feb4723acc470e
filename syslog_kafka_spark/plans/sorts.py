"""Sort / limit / top-k surface (SURVEY §2B.6).

ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition heap +
driver merge of k rows) — no global sort materialization. Full sorts use
range partitioning (sampled split points), which scales; still, every
query here bounds its output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from syslog_kafka_spark.operators.session_cache import session_checkpoint
from syslog_kafka_spark.plans.registry import query
from syslog_kafka_spark.sources.readers import load_tables


@query(
    "sort_top_orders",
    family="sorts",
    oracle="""
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 25
    """,
)
def sort_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY + LIMIT → TakeOrderedAndProject (top-k, no full
    sort)."""
    o = load_tables(spark, sf_dir).orders
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "sort_nulls_ordering",
    family="sorts",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(nullif(l_discount, 0.0) AS DOUBLE) AS disc_or_null
        FROM lineitem
        WHERE l_orderkey <= 100
        ORDER BY disc_or_null ASC NULLS FIRST, l_orderkey, l_linenumber
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST ordering (Spark's ASC default, but stated
    explicitly on both engines since DuckDB defaults to NULLS LAST)."""
    li = load_tables(spark, sf_dir).lineitem
    return (
        li.filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
        )
        .orderBy(
            F.col("disc_or_null").asc_nulls_first(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
    )


@query(
    "sort_mixed_direction",
    family="sorts",
    oracle="""
        SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer
        ORDER BY c_nationkey ASC, c_acctbal DESC NULLS LAST, c_custkey ASC
        LIMIT 50
    """,
)
def sort_mixed_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed asc/desc multi-key sort with explicit null placement."""
    c = load_tables(spark, sf_dir).customer
    return (
        c.select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy(
            F.col("c_nationkey").asc(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey").asc(),
        )
        .limit(50)
    )


@query(
    "sort_global_range_partitioned",
    family="sorts",
    oracle="""
        WITH ranked AS (
          SELECT l_orderkey, l_linenumber, l_extendedprice,
                 row_number() OVER (ORDER BY l_extendedprice DESC,
                                    l_orderkey, l_linenumber) AS rn
          FROM lineitem
        )
        SELECT rn, l_orderkey, l_linenumber,
               CAST(round(l_extendedprice, 2) AS DOUBLE) AS price
        FROM ranked
        WHERE rn % 1000 = 1
        ORDER BY rn
    """,
)
def sort_global_range_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-correct GLOBAL ranking: a naive row_number() over an
    unpartitioned window collapses the whole table into one task, so
    this op computes the total order the way a 100 TB sort must —
    repartitionByRange on the sort key (sampled range bounds, disjoint
    ordered partitions), a LOCAL row_number within each partition (fully
    parallel), and a broadcast map of cumulative partition counts that
    lifts local ranks to global ones. The only driver-side data is one
    count per partition. Output probes every 1000th global rank; the
    total order is unique (full tiebreak), so ranks are independent of
    where the sampled range bounds happen to land. The oracle is the
    declarative single-window ranking — same answer, scale-hostile plan."""
    from pyspark.sql import Window

    li = load_tables(spark, sf_dir).lineitem.select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    keys = [
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ]
    # session_checkpoint pins ONE materialization of the range exchange:
    # the sampled range bounds are per-execution, so letting the counts
    # pass and the ranking pass re-run the exchange independently could
    # place rows differently and corrupt the offsets (at warehouse scale
    # this is the persisted sorted intermediate). Managed handle so
    # clear_session_caches releases it between sweep queries.
    parted = session_checkpoint(
        li.repartitionByRange(16, *keys).withColumn("_pid", F.spark_partition_id())
    )
    # one row per partition — the bounded driver-side piece
    sizes = {r["_pid"]: r["n"] for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]),
        F.col("_pid"),
    )
    local_rn = F.row_number().over(Window.partitionBy("_pid").orderBy(*keys))
    return (
        parted.withColumn("rn", (local_rn + off_expr).cast("bigint"))
        .filter(F.col("rn") % 1000 == 1)
        .select(
            "rn",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
        .orderBy("rn")
    )
