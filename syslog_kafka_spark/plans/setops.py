"""Set-operation surface (SURVEY §2B.7): UNION [ALL], INTERSECT, EXCEPT.

Spark implements INTERSECT/EXCEPT as left-semi/left-anti joins after
dedup — same shuffle profile as the join family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from syslog_kafka_spark.plans.registry import query
from syslog_kafka_spark.sources.readers import load_tables


def _building_custs(t):
    return t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )


def _big_spenders(t):
    return (
        t.orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .filter(F.col("spend") > 400000)
        .select("custkey")
    )


_BUILDING_SQL = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SPENDERS_SQL = """
    SELECT o_custkey AS custkey FROM orders
    GROUP BY o_custkey HAVING round(sum(o_totalprice), 2) > 400000
"""


@query(
    "setop_union_all",
    family="setops",
    oracle=f"""
        SELECT custkey, count(*) AS n
        FROM (({_BUILDING_SQL}) UNION ALL ({_SPENDERS_SQL}))
        GROUP BY custkey
        HAVING count(*) = 2
        ORDER BY custkey
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates — customers in both sets count twice."""
    t = load_tables(spark, sf_dir)
    return (
        _building_custs(t)
        .unionAll(_big_spenders(t))
        .groupBy("custkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == 2)
        .orderBy("custkey")
    )


@query(
    "setop_union_distinct",
    family="setops",
    oracle=f"""
        SELECT count(*) AS n_distinct_custs
        FROM (({_BUILDING_SQL}) UNION ({_SPENDERS_SQL}))
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — dedup across both branches."""
    t = load_tables(spark, sf_dir)
    return (
        _building_custs(t)
        .union(_big_spenders(t))
        .distinct()
        .agg(F.count("*").alias("n_distinct_custs"))
    )


@query(
    "setop_intersect",
    family="setops",
    oracle=f"""
        ({_BUILDING_SQL}) INTERSECT ({_SPENDERS_SQL})
        ORDER BY custkey
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: BUILDING-segment customers who are also big spenders."""
    t = load_tables(spark, sf_dir)
    return _building_custs(t).intersect(_big_spenders(t)).orderBy("custkey")


@query(
    "setop_except",
    family="setops",
    oracle=f"""
        ({_BUILDING_SQL}) EXCEPT ({_SPENDERS_SQL})
        ORDER BY custkey
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: BUILDING-segment customers who are not big spenders."""
    t = load_tables(spark, sf_dir)
    return _building_custs(t).exceptAll(_big_spenders(t)).distinct().orderBy("custkey")


@query(
    "setop_multiset_all",
    family="setops",
    oracle="""
        WITH a AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
             b AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '2-HIGH'),
             ia AS (SELECT custkey FROM a INTERSECT ALL SELECT custkey FROM b),
             ea AS (SELECT custkey FROM a EXCEPT ALL SELECT custkey FROM b)
        SELECT 'intersect_all' AS op, custkey, count(*) AS n FROM ia GROUP BY custkey
        UNION ALL
        SELECT 'except_all' AS op, custkey, count(*) AS n FROM ea GROUP BY custkey
        ORDER BY op, custkey
    """,
)
def setop_multiset_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations — INTERSECT ALL / EXCEPT ALL keep duplicate
    multiplicity (min / difference of per-key counts), unlike the distinct
    variants. Spark plans both as a single hash aggregation of per-side
    counts, so each leg is one shuffle on custkey."""
    o = load_tables(spark, sf_dir).orders
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        F.col("o_custkey").alias("custkey")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("custkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "custkey", "n")
    )
    ea = (
        a.exceptAll(b)
        .groupBy("custkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "custkey", "n")
    )
    return ia.unionAll(ea).orderBy("op", "custkey")
