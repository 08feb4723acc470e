"""Forced-skew 3-way join benchmark: plain shuffle vs salted vs AQE.

The r6 verdict noted the salted-join path is gated salt-invariant
(join_salted_skew) and the skew audit exists (agg_key_skew_audit), but no
measurement showed the salted plan actually BEATING a plain plan on a
genuinely hot key at 10x data. This script closes that gap:

1. Builds a skewed events replica in .bench/skew/ — sf1 events replicated
   REPLICAS times (fresh event_ids) with ONE user_id forced onto ~20% of
   all rows (deterministic: pmod(xxhash64(event_id), 5) == 0 → the hot
   user). That is the "one key owns a fifth of a 100 TB log" shape.
2. Times the same join+aggregate three ways, all with broadcast disabled
   so the join must shuffle (a broadcastable dim dodges key skew by
   construction — the scenario under test is two shuffled sides):
     plain  — AQE off: the hot key lands on ONE task.
     salted — AQE off, operators/skew.salted_join, 32 buckets: the hot
              key spreads across 32 (key, salt) tasks.
     aqe    — AQE on with skew-join splitting; thresholds lowered
              (skewedPartitionThresholdInBytes/advisoryPartitionSizeInBytes)
              so the splitter engages at bench scale — at production
              scale the 256 MB default plays the same role.
3. Verifies all three variants return identical results (the salted and
   AQE plans are semantics-preserving rewrites), then prints a markdown
   table for BENCH_SF1.md.

Usage: python scripts/skew_bench.py [--replicas 10] [--rounds 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

HOT_USER = 777_777
SKEW_DIR = os.path.join(REPO, ".bench", "skew")
SKEW_PATH = os.path.join(SKEW_DIR, "events_skewed.parquet")


def build_skewed_events(spark, replicas: int) -> None:
    """Materialize the skewed replica once (idempotent per replica count).

    Markers from OTHER replica counts are removed on rebuild: the data
    path is shared, so a stale marker from an earlier count would
    otherwise skip the rebuild and benchmark mislabeled data."""
    import glob as _glob

    marker = os.path.join(SKEW_DIR, f"_built_r{replicas}")
    if os.path.exists(marker):
        return
    for stale in _glob.glob(os.path.join(SKEW_DIR, "_built_r*")):
        os.remove(stale)
    src = os.path.join(REPO, ".bench", "sf1", "events.parquet")
    base = spark.read.parquet(src).select("event_id", "user_id", "event_type", "value")
    n = base.count()
    rep = spark.range(replicas).select(F.col("id").alias("_rep"))
    events = (
        base.crossJoin(rep)
        .select(
            (F.col("event_id") + F.col("_rep") * F.lit(n)).alias("event_id"),
            # ~20% of rows land on the hot user, deterministically
            F.when(
                F.pmod(F.xxhash64(F.col("event_id") + F.col("_rep") * F.lit(n)), F.lit(5)) == 0,
                F.lit(HOT_USER),
            )
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "event_type",
            "value",
        )
        .repartition(32)
    )
    events.write.mode("overwrite").parquet(SKEW_PATH)
    open(marker, "w").close()


def the_query(spark, variant: str):
    """events ⋈ per-user dim on the skewed key, then a small aggregate.

    The dim is a plain per-user weight table (every user_id in the
    replica). With broadcast disabled both sides shuffle on user_id —
    the hot key's 20% mass all hashes to one reducer unless salted/AQE
    intervenes."""
    from syslog_kafka_spark.operators.skew import salted_join

    events = spark.read.parquet(SKEW_PATH)
    dim = events.groupBy("user_id").agg(F.count("*").alias("user_n"))
    if variant == "salted":
        joined = salted_join(
            events, dim, "user_id", buckets=32, salt_source="event_id"
        )
    else:
        joined = events.join(dim, "user_id")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value") / F.col("user_n")), 4).alias("w_value"),
        )
        .orderBy("event_type")
    )


def set_confs(spark, variant: str) -> None:
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    if variant == "aqe":
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # engage the splitter at bench scale (defaults: 256 MB / 5x)
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    else:
        spark.conf.set("spark.sql.adaptive.enabled", "false")


def restore_confs(spark) -> None:
    for key in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ):
        spark.conf.unset(key)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from syslog_kafka_spark.session import get_spark

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(SKEW_DIR, exist_ok=True)
    build_skewed_events(spark, args.replicas)

    total = spark.read.parquet(SKEW_PATH).count()
    hot = spark.read.parquet(SKEW_PATH).filter(F.col("user_id") == HOT_USER).count()
    print(f"rows={total:,} hot_key_share={hot / total:.1%}")

    results: dict[str, list[float]] = {}
    answers: dict[str, list] = {}
    for variant in ("plain", "salted", "aqe"):
        set_confs(spark, variant)
        try:
            the_query(spark, variant).collect()  # warm (scan cache, codegen)
            times = []
            for _ in range(args.rounds):
                t0 = time.perf_counter()
                rows = the_query(spark, variant).collect()
                times.append(round(time.perf_counter() - t0, 2))
            results[variant] = times
            answers[variant] = [tuple(r) for r in rows]
        finally:
            restore_confs(spark)
        print(f"{variant}: {times} median={statistics.median(times)}")

    # Semantics-preservation check with a float tolerance: the three
    # variants accumulate double sums under different physical plans, so
    # exact equality of 4-dp-rounded values can spuriously fail at a
    # rounding boundary (the parallelism-invariance hazard class).
    def _rows_close(a, b):
        if len(a) != len(b):
            return False
        for ra, rb in zip(a, b):
            for va, vb in zip(ra, rb):
                if isinstance(va, float):
                    if abs(va - vb) > 1e-3:
                        return False
                elif va != vb:
                    return False
        return True

    assert _rows_close(answers["plain"], answers["salted"]) and _rows_close(
        answers["plain"], answers["aqe"]
    ), "variants disagree — salting/AQE must be semantics-preserving"
    print("\n| variant | runs (s) | median (s) |")
    print("|---|---|---|")
    for variant, times in results.items():
        print(f"| {variant} | {', '.join(map(str, times))} | {statistics.median(times)} |")


if __name__ == "__main__":
    main()
