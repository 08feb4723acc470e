"""Tolerance checks for approximate aggregates (never hash-gated: sketch
results are engine-specific by design)."""

from __future__ import annotations

from syslog_kafka_spark.plans.registry import load_all


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    rows = load_all()["approx_distinct_users"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err <= 0.1, f"{r.event_type}: approx={r.approx_users} exact={r.exact_users}"


def test_percentile_approx_within_tolerance(spark, sf_dir):
    row = load_all()["approx_percentiles"].build(spark, sf_dir).collect()[0]
    pairs = [
        (row.approx_p50, row.exact_p50),
        (row.approx_p90, row.exact_p90),
        (row.approx_p99, row.exact_p99),
    ]
    for approx, exact in pairs:
        assert abs(approx - exact) / max(abs(exact), 1) <= 0.05
