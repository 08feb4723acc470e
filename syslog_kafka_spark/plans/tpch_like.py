"""Composite analytics queries in the TPC-H idiom over the synthetic star
schema — multi-table joins + aggregation + subqueries combined, the shapes
a production log/metrics warehouse actually runs.

All via spark.sql on temp views: these exercise Catalyst's subquery
decorrelation, CTE handling, and join reordering end-to-end. Every one is
hash-gated; the SQL is written in the common Spark/DuckDB dialect subset
(one string serves both engines where possible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from syslog_kafka_spark.plans.registry import query
from syslog_kafka_spark.sources.readers import load_tables


def _views(spark: SparkSession, sf_dir: str) -> None:
    t = load_tables(spark, sf_dir)
    for name in t.names:
        t[name].createOrReplaceTempView(f"v_{name}")


# Q14-ish: promo revenue share. Shared dialect except round/casts kept common.
_PROMO_SQL = """
    SELECT
      CAST(round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%%'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
           / sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS promo_revenue_pct
    FROM %(li)s JOIN %(part)s ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
"""


@query("tpch_promo_revenue", family="joins", oracle=_PROMO_SQL % {"li": "lineitem", "part": "part"})
def tpch_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-style: conditional revenue share over a fact x broadcast-dim
    join with a one-month scan window."""
    _views(spark, sf_dir)
    return spark.sql(_PROMO_SQL % {"li": "v_lineitem", "part": "v_part"})


_BIG_ORDERS_SQL = """
    SELECT c_name, o_orderkey, o_orderdate,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS total_qty
    FROM %(cust)s
    JOIN %(ord)s ON c_custkey = o_custkey
    JOIN %(li)s ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM %(li)s GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
"""


@query(
    "tpch_large_volume_customers",
    family="joins",
    oracle=_BIG_ORDERS_SQL % {"cust": "customer", "ord": "orders", "li": "lineitem"},
)
def tpch_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-style: IN-subquery over an aggregated fact feeding a 3-way
    join — Catalyst plans the subquery as a semi-join on the pre-aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_BIG_ORDERS_SQL % {"cust": "v_customer", "ord": "v_orders", "li": "v_lineitem"})


_DISJUNCTIVE_SQL = """
    SELECT CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM %(li)s JOIN %(part)s ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 20 AND l_quantity <= 40)
       OR (p_type = 'STANDARD' AND l_discount = 0.0)
"""


@query(
    "tpch_disjunctive_predicates",
    family="joins",
    oracle=_DISJUNCTIVE_SQL % {"li": "lineitem", "part": "part"},
)
def tpch_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-style: OR-of-conjunctions across both join sides — exercises
    CNF conversion and partial predicate pushdown."""
    _views(spark, sf_dir)
    return spark.sql(_DISJUNCTIVE_SQL % {"li": "v_lineitem", "part": "v_part"})


# Money arithmetic in integer cents: Spark's round(double) rounds the
# shortest decimal repr (BigDecimal.valueOf) while DuckDB rounds the raw
# binary value, so any half-cent boundary flips between engines. Integer
# cents + a single exact division + floor is bit-deterministic on both.
_ABOVE_AVG_SQL = """
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
      FROM %(cust)s
    ), natavg AS (
      SELECT c_nationkey,
             CAST(floor(CAST(sum(cents) AS DOUBLE) / count(*)) AS BIGINT) AS avg_cents
      FROM c GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_name,
           CAST(c.cents - natavg.avg_cents AS DOUBLE) / 100 AS above_by
    FROM c
    JOIN natavg ON c.c_nationkey = natavg.c_nationkey
    WHERE c.cents * 10 > natavg.avg_cents * 18
    ORDER BY c.c_custkey
"""


@query(
    "tpch_above_nation_average",
    family="aggregation",
    oracle=_ABOVE_AVG_SQL % {"cust": "customer"},
)
def tpch_above_nation_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-flavored: CTE computing per-group averages joined back against
    the base table (decorrelated scalar-subquery pattern)."""
    _views(spark, sf_dir)
    return spark.sql(_ABOVE_AVG_SQL % {"cust": "v_customer"})


_NATION_FLOW_SQL = """
    SELECT
      n1.n_name AS cust_nation,
      n2.n_name AS supp_nation,
      CAST(year(o_orderdate) AS INT) AS order_year,
      CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS volume
    FROM %(cust)s
    JOIN %(nat)s n1 ON c_nationkey = n1.n_nationkey
    JOIN %(ord)s ON o_custkey = c_custkey
    JOIN %(li)s ON l_orderkey = o_orderkey
    JOIN %(sup)s ON s_suppkey = l_suppkey
    JOIN %(nat)s n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_0', 'NATION_1') AND n2.n_name IN ('NATION_0', 'NATION_1')
      AND n1.n_name <> n2.n_name
    GROUP BY cust_nation, supp_nation, order_year
    ORDER BY cust_nation, supp_nation, order_year
"""


@query(
    "tpch_nation_volume_flow",
    family="joins",
    oracle=_NATION_FLOW_SQL
    % {"cust": "customer", "nat": "nation", "ord": "orders", "li": "lineitem", "sup": "supplier"},
)
def tpch_nation_volume_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-style: six-way join with the same dim table aliased twice
    (customer nation vs supplier nation) and an inequality between them."""
    _views(spark, sf_dir)
    return spark.sql(
        _NATION_FLOW_SQL
        % {"cust": "v_customer", "nat": "v_nation", "ord": "v_orders", "li": "v_lineitem", "sup": "v_supplier"}
    )


_SCALAR_SUBQ_SQL = """
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice AS DOUBLE) AS l_extendedprice
    FROM %(li)s
    WHERE l_extendedprice > (SELECT avg(l_extendedprice) * 1.95 FROM %(li)s)
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
"""


@query(
    "tpch_scalar_subquery_filter",
    family="joins",
    oracle=_SCALAR_SUBQ_SQL % {"li": "lineitem"},
)
def tpch_scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate (planned as a broadcast
    of one value after a separate aggregation job)."""
    _views(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ_SQL % {"li": "v_lineitem"})
