"""VERDICT r5 #6 experiment: interpreted transform/slice expression
pipeline vs a mapInArrow kernel for llm_winnowing_fingerprints.

MEASURED (sf1 = 50k docs, local[32], within one warm session, second
iteration of each): expression 3.74 s, arrow kernel 2.03 s — and the
kernel also skips the ~8 s first-heavy-lambda-per-JVM interpreter warmup
(round-0: 11.6 s vs 3.5 s). VERDICT: the kernel wins on both constant
and warmup; the gated query now uses plans/llm.winnow_arrow_pairs, and
the expression pipeline below is preserved as the documented loser
(same arithmetic — both variants return identical rows, asserted here).

Usage: python scripts/winnow_arrow_experiment.py [sf_dir] [expr|arrow|both]
Time each variant in its OWN process for honest cold numbers.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_expr_variant(spark, sf_dir: str):
    """The LOSER: k-gram hashing and window-min as interpreted Catalyst
    array lambdas (higher-order functions are not codegen'd; each heavy
    lambda pays a per-JVM interpreter warmup). Kept for the record and
    as the cross-check twin of the Arrow kernel."""
    import pyspark.sql.functions as F

    from syslog_kafka_spark.operators.dedup import normalized
    from syslog_kafka_spark.plans.llm import _WINNOW_K, _WINNOW_W
    from syslog_kafka_spark.sources.readers import load_tables, spread

    k, w = _WINNOW_K, _WINNOW_W
    d = load_tables(spark, sf_dir).documents
    t = F.col("_nt")
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
        lambda i: F.conv(F.substring(F.md5(t.substr(i, F.lit(k))), 1, 15), 16, 10).cast(
            "bigint"
        ),
    )
    with_h = spread(d.select("doc_id", normalized("text").alias("_nt"))).select(
        "doc_id", hashes.alias("hs")
    )
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("hs") - (w - 1), F.lit(1))),
        lambda p: F.array_min(F.slice("hs", p, F.lit(w))),
    )
    fps = (
        with_h.select("doc_id", mins.alias("_mins"))
        .select(
            "doc_id",
            F.explode(
                F.filter(
                    "_mins",
                    lambda x, i: (i == F.lit(0))
                    | (x != F.get(F.col("_mins"), i - F.lit(1))),
                )
            ).alias("fp"),
        )
    )
    return (
        fps.groupBy("fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), F.col("n_occurrences").desc(), "fp")
        .limit(20)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".bench", "sf1")
    which = sys.argv[2] if len(sys.argv) > 2 else "both"

    from syslog_kafka_spark.plans.registry import load_all
    from syslog_kafka_spark.session import get_spark

    spark = get_spark("winnow-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    results = {}
    if which in ("expr", "both"):
        t0 = time.perf_counter()
        expr_rows = build_expr_variant(spark, sf_dir).collect()
        results["expr"] = round(time.perf_counter() - t0, 3)
    if which in ("arrow", "both"):
        t0 = time.perf_counter()
        arrow_rows = specs["llm_winnowing_fingerprints"].build(spark, sf_dir).collect()
        results["arrow"] = round(time.perf_counter() - t0, 3)
    if which == "both":
        same = [tuple(r) for r in expr_rows] == [tuple(r) for r in arrow_rows]
        print(f"results_identical={same}")
    print(f"sf_dir={sf_dir} timings={results}")


if __name__ == "__main__":
    main()
