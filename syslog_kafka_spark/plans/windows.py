"""Window-function surface (SURVEY §2B.5): ranking, offsets, running
frames (ROWS and RANGE), sessionization via lag.

Window shuffles hash on partitionBy keys; these partition on
high-cardinality keys (custkey/user_id) so the shuffle is balanced and the
per-partition sort is small. Unpartitioned windows serialize onto one task
and are forbidden over fact-sized input at 100 TB; the one exception here
(window_share_of_total) runs on a POST-aggregation relation bounded by
dimension cardinality, which is the only shape where they're safe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from syslog_kafka_spark.plans.registry import query
from syslog_kafka_spark.sources.readers import load_tables


@query(
    "window_top3_orders_per_cust",
    family="windows",
    oracle="""
        WITH ranked AS (
          SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rn
          FROM orders
        )
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM ranked WHERE rn <= 3 AND o_custkey <= 200
        ORDER BY o_custkey, rn
    """,
)
def window_top3_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the canonical windowed top-k."""
    o = load_tables(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") <= 200))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_running_spend",
    family="windows",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS DOUBLE) AS running_spend
        FROM orders
        WHERE o_custkey <= 100
        ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame (deterministic because the
    frame order includes the unique o_orderkey)."""
    o = load_tables(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_rank_family",
    family="windows",
    oracle="""
        SELECT c_nationkey, c_custkey,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile,
               CAST(round(percent_rank() OVER w, 4) AS DOUBLE) AS pct_rank,
               CAST(round(cume_dist() OVER w, 4) AS DOUBLE) AS cdist
        FROM customer
        WHERE c_custkey <= 300
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_nationkey, rnk, c_custkey
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank/cume_dist over one window spec
    (single shuffle+sort serves all five)."""
    c = load_tables(spark, sf_dir).customer
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.filter(F.col("c_custkey") <= 300)
        .select(
            "c_nationkey",
            "c_custkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 4).alias("cdist"),
        )
        .orderBy("c_nationkey", "rnk", "c_custkey")
    )


@query(
    "window_lag_lead_gaps",
    family="windows",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER w AS prev_ts,
                 lead(event_id) OVER w AS next_event
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id, next_event,
               (epoch_us(ts) - epoch_us(prev_ts)) // 1000000 AS gap_sec
        FROM seq
        WHERE prev_ts IS NOT NULL
          AND (epoch_us(ts) - epoch_us(prev_ts)) // 1000000 > 86400
        ORDER BY user_id, event_id
    """,
)
def window_lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead offsets: find >1-day silences per user in the event log."""
    e = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("event_id").over(w).alias("next_event"),
    )
    # Whole-second gap via epoch micros (unix_timestamp would truncate the
    # sub-second part before subtracting, disagreeing with the oracle).
    gap = F.expr("(unix_micros(ts) - unix_micros(prev_ts)) div 1000000")
    return (
        seq.filter(F.col("prev_ts").isNotNull() & (gap > 86400))
        .select(
            "user_id",
            "event_id",
            "next_event",
            gap.alias("gap_sec"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_range_frame_hourly",
    family="windows",
    oracle="""
        SELECT user_id, event_id,
               count(*) OVER (
                 PARTITION BY user_id
                 ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) AS n_last_hour
        FROM events
        WHERE user_id <= 20
        ORDER BY user_id, event_id
    """,
)
def window_range_frame_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over epoch seconds: events per user in the trailing
    hour. RANGE frames need a numeric order key in Spark, so both engines
    order by epoch(ts) — identical semantics."""
    e = load_tables(spark, sf_dir).events
    # Exact micros on both engines (epoch(ts) in DuckDB is fractional,
    # unix_timestamp in Spark truncates — micros agree bit-for-bit).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.filter(F.col("user_id") <= 20)
        .select("user_id", "event_id", F.count("*").over(w).alias("n_last_hour"))
        .orderBy("user_id", "event_id")
    )


@query(
    "window_first_last_value",
    family="windows",
    oracle="""
        SELECT DISTINCT l_orderkey,
               first_value(l_partkey) OVER w AS first_part,
               last_value(l_partkey) OVER (
                 PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_part,
               count(*) OVER (PARTITION BY l_orderkey) AS n_lines
        FROM (SELECT * FROM lineitem WHERE l_orderkey <= 500)
        WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
        ORDER BY l_orderkey
    """,
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over a full-partition frame + unordered count window."""
    li = load_tables(spark, sf_dir).lineitem
    w_ord = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    w_full = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        li.filter(F.col("l_orderkey") <= 500)
        .select(
            "l_orderkey",
            F.first("l_partkey").over(w_ord).alias("first_part"),
            F.last("l_partkey").over(w_full).alias("last_part"),
            F.count("*").over(Window.partitionBy("l_orderkey")).alias("n_lines"),
        )
        .distinct()
        .orderBy("l_orderkey")
    )


@query(
    "window_sessionize_30min",
    family="windows",
    oracle="""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id,
                 sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS session_id
          FROM flagged
        )
        SELECT user_id, CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM sessions
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def window_sessionize_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum = session ids, then
    sessions per user. This is the batch twin of the streaming
    session_window aggregation (SURVEY §2B.9)."""
    e = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias("new_session"),
    )
    sessions = flagged.select("user_id", F.sum("new_session").over(wrun).alias("session_id"))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "window_funnel_conversion",
    family="windows",
    oracle="""
        WITH v AS (
          SELECT user_id, ts, event_type,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS v_ts
          FROM events
        ), c AS (
          SELECT user_id, ts, event_type, v_ts,
                 min(CASE WHEN event_type = 'click' AND ts > v_ts THEN ts END)
                   OVER (PARTITION BY user_id) AS c_ts
          FROM v
        ), p AS (
          SELECT user_id, v_ts, c_ts,
                 min(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END)
                   OVER (PARTITION BY user_id) AS p_ts
          FROM c
        )
        SELECT
          count(DISTINCT CASE WHEN v_ts IS NOT NULL THEN user_id END) AS n_viewed,
          count(DISTINCT CASE WHEN c_ts IS NOT NULL THEN user_id END) AS n_clicked_after_view,
          count(DISTINCT CASE WHEN p_ts IS NOT NULL THEN user_id END) AS n_purchased_after_click
        FROM p
    """,
)
def window_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase, strictly
    increasing timestamps per user): each stage's earliest qualifying
    event comes from a window min over the previous stage's anchor.
    Three window layers share one partitioning on user_id, so Catalyst
    plans a single exchange and three in-partition sorts — the funnel
    never joins events against events."""
    e = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id")
    v = e.select(
        "user_id", "ts", "event_type",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias("v_ts"),
    )
    c = v.select(
        "user_id", "ts", "event_type", "v_ts",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")), F.col("ts"))
        ).over(w).alias("c_ts"),
    )
    p = c.select(
        "user_id", "v_ts", "c_ts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")),
                F.col("ts"),
            )
        ).over(w).alias("p_ts"),
    )
    cd = F.countDistinct
    return p.agg(
        cd(F.when(F.col("v_ts").isNotNull(), F.col("user_id"))).alias("n_viewed"),
        cd(F.when(F.col("c_ts").isNotNull(), F.col("user_id"))).alias("n_clicked_after_view"),
        cd(F.when(F.col("p_ts").isNotNull(), F.col("user_id"))).alias("n_purchased_after_click"),
    )


@query(
    "window_moving_avg_7d",
    family="windows",
    oracle="""
        WITH daily AS (
          SELECT year(o_orderdate) AS yr,
                 CAST(o_orderdate AS DATE) AS d,
                 CAST(round(round(sum(o_totalprice), 2) * 100) AS BIGINT) AS rev_cents
          FROM orders
          GROUP BY yr, d
        )
        SELECT yr, d, rev_cents,
               CAST(round(sum(rev_cents) OVER w / (1.0 * count(*) OVER w)) AS BIGINT)
                 AS avg_7d_cents
        FROM daily
        WINDOW w AS (
          PARTITION BY yr
          ORDER BY date_diff('day', DATE '1992-01-01', d)
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
        )
        ORDER BY d
    """,
)
def window_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average of daily revenue via a RANGE frame
    over day numbers. Daily revenue is held as exact integer cents so the
    sliding sum is associativity-proof (both engines' frame evaluation
    orders agree bit-for-bit), and the average is emitted as whole cents:
    scale-0 rounding is the one rounding mode where Spark (decimal-string
    HALF_UP) and DuckDB (binary half-away-from-zero) provably agree.
    Partitioned by year — the window input is one row per day, so even at
    100 TB the windowed relation is calendar-sized, and the year partition
    keeps any one task's frame bounded."""
    o = load_tables(spark, sf_dir).orders
    daily = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(
        F.round(F.round(F.sum("o_totalprice"), 2) * 100).cast("bigint").alias("rev_cents")
    )
    w = (
        Window.partitionBy("yr")
        .orderBy(F.datediff(F.col("d"), F.lit("1992-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "yr",
        "d",
        "rev_cents",
        F.round(F.sum("rev_cents").over(w) / (1.0 * F.count("*").over(w)))
        .cast("bigint")
        .alias("avg_7d_cents"),
    ).orderBy("d")


@query(
    "window_gapfill_daily",
    family="windows",
    oracle="""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n,
                 CAST(round(max(value), 2) AS DOUBLE) AS mx
          FROM events WHERE user_id <= 5
          GROUP BY user_id, d
        ), span AS (
          SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY user_id
        ), cal AS (
          SELECT user_id,
                 CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
          FROM span
        )
        SELECT c.user_id, c.d,
               coalesce(n, 0) AS n_events,
               last_value(mx IGNORE NULLS) OVER (
                 PARTITION BY c.user_id ORDER BY c.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS mx_filled
        FROM cal c LEFT JOIN daily dd ON c.user_id = dd.user_id AND c.d = dd.d
        ORDER BY c.user_id, c.d
    """,
)
def window_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (hypertable-style): per-user daily rollup,
    a generated calendar spanning each user's first→last day, zero-fill
    for counts and forward-fill (last_value IGNORE NULLS) for the max
    gauge. The calendar explode is per-user days — bounded by span, not
    by event volume — and the fill window shares the user partitioning,
    so the whole plan is one shuffle on user_id."""
    e = load_tables(spark, sf_dir).events
    daily = (
        e.filter(F.col("user_id") <= 5)
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"), F.round(F.max("value"), 2).alias("mx"))
    )
    span = daily.groupBy("user_id").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    cal = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            "d",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("mx", ignorenulls=True).over(w).alias("mx_filled"),
        )
        .orderBy("user_id", "d")
    )


@query(
    "window_share_of_total",
    family="windows",
    oracle="""
        WITH nat AS (
          SELECT n.n_name,
                 CAST(round(round(sum(o.o_totalprice), 2) * 100) AS BIGINT) AS rev_cents
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name
        )
        SELECT n_name, rev_cents,
               CAST(round(10000.0 * rev_cents / sum(rev_cents) OVER ()) AS BIGINT)
                 AS share_bps,
               CAST(rank() OVER (ORDER BY rev_cents DESC, n_name) AS BIGINT) AS rev_rank
        FROM nat
        ORDER BY rev_rank
    """,
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of global revenue in basis
    points, plus its revenue rank. The unpartitioned window is safe here
    because its input is the POST-aggregation relation — one row per
    nation, bounded by dimension cardinality, not by fact volume. Revenue
    is exact integer cents and the share is scale-0-rounded basis points,
    the rounding mode both engines agree on bit-for-bit."""
    t = load_tables(spark, sf_dir)
    nat = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.round(F.sum("o_totalprice"), 2) * 100).cast("bigint").alias("rev_cents"))
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.col("rev_cents").desc(), F.col("n_name"))
    return nat.select(
        "n_name",
        "rev_cents",
        F.round(10000.0 * F.col("rev_cents") / F.sum("rev_cents").over(w_all))
        .cast("bigint")
        .alias("share_bps"),
        F.rank().over(w_rank).cast("bigint").alias("rev_rank"),
    ).orderBy("rev_rank")


@query(
    "window_gapfill_interpolate",
    family="windows",
    oracle="""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d,
                 CAST(round(sum(CAST(round(value * 100) AS BIGINT)) * 1.0 / count(value))
                      AS BIGINT) AS v_cents
          FROM events WHERE user_id <= 5
          GROUP BY user_id, CAST(ts AS DATE)
        ), span AS (
          SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY user_id
        ), cal AS (
          SELECT user_id,
                 CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
          FROM span
        ), joined AS (
          SELECT c.user_id, c.d, v_cents
          FROM cal c LEFT JOIN daily dd ON c.user_id = dd.user_id AND c.d = dd.d
        ), anchored AS (
          SELECT user_id, d, v_cents,
                 last_value(v_cents IGNORE NULLS) OVER wp AS prev_v,
                 last_value(CASE WHEN v_cents IS NOT NULL THEN d END IGNORE NULLS)
                   OVER wp AS prev_d,
                 first_value(v_cents IGNORE NULLS) OVER wn AS next_v,
                 first_value(CASE WHEN v_cents IS NOT NULL THEN d END IGNORE NULLS)
                   OVER wn AS next_d
          FROM joined
          WINDOW wp AS (PARTITION BY user_id ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY user_id ORDER BY d
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, d, v_cents,
               CASE
                 WHEN v_cents IS NOT NULL THEN v_cents
                 WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                   CAST(round(prev_v + (next_v - prev_v) * 1.0
                        * date_diff('day', prev_d, d)
                        / date_diff('day', prev_d, next_d)) AS BIGINT)
                 ELSE NULL
               END AS v_interp_cents
        FROM anchored
        ORDER BY user_id, d
    """,
)
def window_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap filling (the `interpolate()` counterpart
    to window_gapfill_daily's forward fill): missing days get the
    time-weighted line between the nearest observed values on either
    side; no extrapolation past the ends. The gauge rides as exact
    integer cents with one scale-0-rounded division, so both engines
    agree bit-for-bit. Both anchor windows share the one user_id
    shuffle (two in-partition sorts, opposite directions)."""
    e = load_tables(spark, sf_dir).events
    daily = (
        e.filter(F.col("user_id") <= 5)
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            # Per-event integer cents first: the exact BIGINT sum makes the
            # daily mean a single scale-0-rounded division, immune to the
            # engines' different fp-sum orders and 2-dp half boundaries.
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                * 1.0
                / F.count("value")
            )
            .cast("bigint")
            .alias("v_cents")
        )
    )
    span = daily.groupBy("user_id").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    cal = span.select("user_id", F.explode(F.sequence("d0", "d1")).alias("d"))
    joined = cal.join(daily, ["user_id", "d"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("v_cents").isNotNull(), F.col("d"))
    anchored = joined.select(
        "user_id",
        "d",
        "v_cents",
        F.last("v_cents", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_d, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("v_cents", ignorenulls=True).over(wn).alias("next_v"),
        F.first(obs_d, ignorenulls=True).over(wn).alias("next_d"),
    )
    interp = (
        F.when(F.col("v_cents").isNotNull(), F.col("v_cents"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.round(
                F.col("prev_v")
                + (F.col("next_v") - F.col("prev_v"))
                * 1.0
                * F.datediff("d", "prev_d")
                / F.datediff("next_d", "prev_d")
            ).cast("bigint"),
        )
        .otherwise(F.lit(None).cast("bigint"))
    )
    return (
        anchored.select("user_id", "d", "v_cents", interp.alias("v_interp_cents"))
        .orderBy("user_id", "d")
    )


@query(
    "window_rolling_distinct_users",
    family="windows",
    oracle="""
        WITH daily AS (
          SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        days AS (SELECT DISTINCT day FROM daily)
        SELECT d.day AS day, count(DISTINCT p.user_id) AS u7_users
        FROM days d
        JOIN daily p ON p.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
        ORDER BY d.day
    """,
)
def window_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day — the canonical engagement
    metric no window frame can express (COUNT(DISTINCT) OVER RANGE is
    unsupported on both engines).

    Scale shape: collapse to distinct (day, user) pairs FIRST (the big
    shuffle, bounded by users x days, not by raw events), then explode
    each pair to the <=7 window-end days it contributes to and hash-agg a
    distinct count per day. Work is 7x the pair count — linear — where
    the naive day-range self-join is pairs x days. At 100 TB the same
    plan swaps the exact distinct for an HLL sketch merge; the explode
    stays identical."""
    e = load_tables(spark, sf_dir).events
    daily = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = daily.select(F.col("day").alias("day_end")).distinct()
    contrib = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "day_end"
        ),
        "user_id",
    )
    return (
        contrib.join(days, "day_end")
        .groupBy("day_end")
        .agg(F.countDistinct("user_id").alias("u7_users"))
        .select(F.col("day_end").alias("day"), "u7_users")
        .orderBy("day")
    )


@query(
    "window_ewma_user_value",
    family="windows",
    oracle="""
        SELECT user_id,
               count(*) AS n_events,
               CAST(round(list_reduce(
                 list_transform(list(value ORDER BY ts, event_id), x -> CAST(x AS DOUBLE)),
                 (acc, x) -> 0.3 * x + 0.7 * acc
               ), 4) AS DOUBLE) AS ewma_value
        FROM events
        GROUP BY user_id
        HAVING count(*) >= 3
        ORDER BY user_id
    """,
)
def window_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (alpha = 0.3, seeded
    at the first observation) via an ordered higher-order fold: collect the
    time-ordered value sequence and reduce with acc' = a*x + (1-a)*acc.
    The fold is a JVM-side lambda over a grouped array — one exchange on
    user_id, no UDF, no iteration. Both engines execute the identical
    left-to-right double-precision fold (DuckDB list_reduce seeds from the
    first element; the Spark aggregate's NULL-seeded WHEN reproduces it),
    so results are bit-comparable at round(4). Per-user sequences are
    bounded (events per entity), so the collected array is small even when
    the table is 100 TB."""
    e = load_tables(spark, sf_dir).events
    ewma = F.expr(
        """
        round(aggregate(
          transform(array_sort(collect_list(struct(ts, event_id, value))),
                    s -> CAST(s.value AS DOUBLE)),
          CAST(NULL AS DOUBLE),
          (acc, x) -> CASE WHEN acc IS NULL THEN x ELSE 0.3 * x + 0.7 * acc END
        ), 4)
        """
    )
    return (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), ewma.alias("ewma_value"))
        .filter(F.col("n_events") >= 3)
        .orderBy("user_id")
    )


@query(
    "window_zscore_anomaly",
    family="windows",
    oracle="""
        SELECT event_id, event_type,
               CAST(round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 3) AS DOUBLE) AS zscore
        FROM events
        QUALIFY abs((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type)) > 2.0
        ORDER BY event_id
    """,
)
def window_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-relative anomaly detection: z-score each event against
    its event_type cohort (unbounded window mean/stddev) and keep |z| > 2.
    The plan is one exchange on event_type computing both moments in a
    single Window operator, then a filter — the standard outlier sweep a
    telemetry pipeline runs per batch. No global sort until the final
    presentation ORDER BY, and the survivors are a tiny fraction of the
    input, so the result stays driver-safe at any scale."""
    e = load_tables(spark, sf_dir).events
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return (
        e.select("event_id", "event_type", z.alias("_z"))
        .filter(F.abs(F.col("_z")) > 2.0)
        .select("event_id", "event_type", F.round("_z", 3).alias("zscore"))
        .orderBy("event_id")
    )


@query(
    "window_pct_change_mom",
    family="windows",
    oracle="""
        WITH monthly AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                 sum(o_totalprice) AS revenue
          FROM orders
          GROUP BY 1
        )
        SELECT month,
               CAST(round(revenue, 2) AS DOUBLE) AS revenue,
               CAST(round(100.0 * (revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month), 2) AS DOUBLE) AS pct_change
        FROM monthly
        ORDER BY month
    """,
)
def window_pct_change_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth: rollup to monthly revenue, then a
    lag-based percent change — the canonical KPI query. The window is a
    single-partition sort, which is safe ONLY because it runs on the
    already-aggregated monthly series (dozens of rows), never on the
    fact table; the heavy lifting is the partial-aggregated monthly
    rollup underneath. First month's change is NULL by definition."""
    o = load_tables(spark, sf_dir).orders
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        monthly.select(
            "month",
            F.round("revenue", 2).alias("revenue"),
            F.round(100.0 * (F.col("revenue") - prev) / prev, 2).alias("pct_change"),
        )
        .orderBy("month")
    )


@query(
    "window_cohort_retention",
    family="windows",
    oracle="""
        WITH firsts AS (
          SELECT user_id, min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
          FROM events GROUP BY user_id
        ), activity AS (
          SELECT DISTINCT e.user_id, f.cohort_week,
                 datediff('week', f.cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) AS week_no
          FROM events e JOIN firsts f USING (user_id)
        )
        SELECT cohort_week, week_no, count(*) AS n_active
        FROM activity
        WHERE week_no <= 3
        GROUP BY cohort_week, week_no
        ORDER BY cohort_week, week_no
    """,
)
def window_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-activity week,
    counted as active in each subsequent week — THE product-analytics
    query. Plan shape: one aggregate for cohort assignment (tiny,
    broadcast back onto the event scan), a distinct on (user, week_no)
    so multiple events in a week count once, then a small group-by. The
    fact table is scanned twice (min + activity) but shuffled only on
    user_id, and the retention matrix itself is cohorts x weeks —
    driver-safe at any scale."""
    e = load_tables(spark, sf_dir).events
    week = F.date_trunc("week", "ts").cast("date")
    firsts = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = (
        e.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(week, F.col("cohort_week")) / 7).cast("int").alias("week_no"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("week_no") <= 3)
        .groupBy("cohort_week", "week_no")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_no")
    )


@query(
    "window_nth_value_snapshots",
    family="windows",
    oracle="""
        WITH ranked AS (
          SELECT o_custkey,
                 row_number() OVER w AS rn,
                 count(*) OVER (PARTITION BY o_custkey) AS n_orders,
                 first_value(o_totalprice) OVER w AS top_price,
                 nth_value(o_totalprice, 2) OVER w AS second_price,
                 nth_value(o_totalprice, 3) OVER w AS third_price
          FROM orders
          WHERE o_custkey <= 200
          WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
          )
        )
        SELECT o_custkey, n_orders,
               CAST(round(top_price, 2) AS DOUBLE) AS top_price,
               CAST(round(second_price, 2) AS DOUBLE) AS second_price,
               CAST(round(third_price, 2) AS DOUBLE) AS third_price
        FROM ranked
        WHERE rn = 1
        ORDER BY o_custkey
    """,
)
def window_nth_value_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a full-partition frame: per customer, the 1st/2nd/
    3rd highest order prices in one Window operator (NULL where the
    customer has fewer orders — nth_value's defining semantics vs a
    rank-filter join). One exchange on o_custkey computes all three
    positional picks plus the partition count; the rn=1 filter collapses
    to one row per customer without a second shuffle. Ties are broken by
    o_orderkey inside the frame ordering, so both engines pick identical
    rows."""
    o = load_tables(spark, sf_dir).orders.filter(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wp = Window.partitionBy("o_custkey")
    ranked = o.select(
        "o_custkey",
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        ).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_orders"),
        F.first("o_totalprice").over(w).alias("top_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "n_orders",
            F.round("top_price", 2).alias("top_price"),
            F.round("second_price", 2).alias("second_price"),
            F.round("third_price", 2).alias("third_price"),
        )
        .orderBy("o_custkey")
    )
