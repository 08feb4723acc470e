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

:func:`session_cache` is that policy: an LRU of eviction HANDLES keyed
by Catalyst's ``semanticHash`` of the analyzed plan, per session
(weakly referenced, so a stopped session drops its registry). Hitting
the entry budget unpersists the least-recently-used frame BEFORE the
new one is filled, so the persisted peak never exceeds the budget.
Re-requesting an evicted plan simply re-caches and re-fills it —
eviction is a performance event, never a correctness one.

Storage identity and output naming belong to Spark's CacheManager, not
this module: every call returns the CALLER's own ``df.cache()`` (the
CacheManager dedups storage across ``sameResult`` plans and remaps
output attributes itself), never a previously stored DataFrame —
canonicalization strips alias names, so handing back another call's
frame could surface the wrong column names for a semantically-equal
plan. The LRU stores one representative frame per hash purely as the
unpersist handle. The eager fill runs on every call: on an
already-persisted entry it is a cheap cached count, and it transparently
re-fills an entry some outside actor (``catalog.clearCache()``, a
manual ``unpersist``) dropped behind our back.

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
    """Cache ``df`` under the session LRU budget; eagerly fill by default.

    Returns ``df.cache()`` itself — storage dedup across same-plan calls
    is the CacheManager's job (``sameResult`` + attribute remap), and the
    caller always sees its own column names. The LRU only bounds how many
    distinct plans stay persisted, evicting the least-recently-used via
    non-blocking unpersist BEFORE the incoming frame is materialized.
    """
    spark = df.sparkSession
    lru: OrderedDict = _LRU.setdefault(spark, OrderedDict())
    key = df._jdf.queryExecution().analyzed().semanticHash()
    cached = df.cache()
    # Re-register (or register) this plan as most-recently-used. The
    # stored frame is only the eviction handle; unpersisting it drops the
    # storage shared by every sameResult plan.
    lru.pop(key, None)
    lru[key] = cached
    # Evict BEFORE the eager fill so the persisted peak stays at the
    # budget — filling first would transiently hold budget+1 corpus-sized
    # frames, exactly the spike the policy exists to prevent.
    while len(lru) > _budget():
        _, evicted = lru.popitem(last=False)
        try:
            evicted.unpersist(blocking=False)
        except Exception:
            pass  # session shutting down mid-evict is fine
    if eager:
        # Eager fill: concurrent downstream stages race a cold cache and
        # each recompute the plan; one count() fills it in a single pass.
        # On an already-persisted entry this is a cheap cached count, and
        # it re-fills an entry an outside clearCache() dropped.
        cached.count()
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
