"""Bounded session-level cache registry for expensive materialized frames.

The engine deliberately caches a handful of expensive intermediates for
the life of a session (the LSH shingle/signature base, n-gram hash
frames, IVF-assigned embeddings) because N concurrent map stages racing
a COLD cache each recompute it (measured 36 s vs 16 s at sf1,
``operators/dedup.py``). Raw ``.cache()`` made that working set
UNBOUNDED: a long session sweeping many queries (or many scale factors)
accumulates every distinct cached plan until the driver heap dies — the
r8 sf10 sweep needed a 48 GiB driver heap plus manual
``catalog.clearCache()`` between queries (BENCH_SF10.md). A real
long-lived session needs an unpersist policy, not a bigger heap.

:func:`session_cache` is that policy: an LRU of cached frames keyed by
Catalyst's ``semanticHash`` of the analyzed plan, per session (weakly
referenced, so a stopped session drops its registry). Hitting the entry
budget unpersists the least-recently-used frame (non-blocking — Spark
drops its blocks lazily). Re-requesting an evicted plan simply re-caches
and re-fills it, so eviction is a performance event, never a
correctness one.

On a 1000-executor cluster the same policy applies to executor storage
memory: each cached base is a materialized intermediate a warehouse
would spill to a temp table; bounding the number of live ones keeps
storage-memory pressure constant regardless of how many distinct
queries a session runs.

Budget is entries, not bytes: every frame routed here is O(corpus)
per-document arrays at the SAME scale factor within a session, so
entry-count is a faithful proxy and avoids a size-estimation pass.
Tunable via ``SPARK_GRAFT_CACHE_ENTRIES`` (default 12 — comfortably
above the ~6 distinct bases one bench sweep touches per scale factor,
small enough that two scale factors' worth cannot pile up).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

_LRU: WeakKeyDictionary = WeakKeyDictionary()  # SparkSession -> OrderedDict


def _budget() -> int:
    return int(os.environ.get("SPARK_GRAFT_CACHE_ENTRIES", "12"))


def session_cache(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Cache ``df`` with session-LRU eviction; eagerly fill by default.

    Same-plan calls (Catalyst ``semanticHash`` of the analyzed plan)
    return the already-cached frame and skip the eager fill — cheaper
    than the raw ``.cache(); .count()`` idiom it replaces, which
    re-counted on every call. Exceeding the entry budget unpersists the
    least-recently-used frame (non-blocking).
    """
    spark = df.sparkSession
    lru: OrderedDict = _LRU.setdefault(spark, OrderedDict())
    key = df._jdf.queryExecution().analyzed().semanticHash()
    hit = lru.get(key)
    if hit is not None:
        lru.move_to_end(key)
        return hit
    cached = df.cache()
    if eager:
        # Eager fill: concurrent downstream stages race a cold cache and
        # each recompute the plan; one count() fills it in a single pass.
        cached.count()
    lru[key] = cached
    while len(lru) > _budget():
        _, evicted = lru.popitem(last=False)
        try:
            evicted.unpersist(blocking=False)
        except Exception:
            pass  # session shutting down mid-evict is fine
    return cached


def clear_session_caches(spark: SparkSession) -> int:
    """Unpersist every frame this registry holds for ``spark``.

    For sweep harnesses (scripts/sf10_probe.py) that previously needed
    ``catalog.clearCache()`` — this drops only the engine's own entries,
    leaving caller-managed caches alone. Returns the number evicted.
    """
    lru: OrderedDict | None = _LRU.get(spark)
    if not lru:
        return 0
    n = len(lru)
    while lru:
        _, evicted = lru.popitem(last=False)
        try:
            evicted.unpersist(blocking=False)
        except Exception:
            pass
    return n
