"""Contract test for the bench CLI — the external driver parses bench.py's
single JSON line, so its shape is product surface, not an implementation
detail. Runs a 3-query smoke subset in a subprocess (own JVM) to keep the
suite fast while exercising the real entry point end to end.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_wellformed_json_line(sf_dir):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_ONLY="agg_pricing_summary,sort_top_orders,scalar_string_funcs",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        check=True,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"bench must print exactly one line, got: {lines}"
    d = json.loads(lines[0])
    assert set(d) == {"metric", "value", "unit", "queries", "sf"}
    assert d["unit"] == "sec" and d["metric"] == "inventory_wall_clock"
    assert set(d["queries"]) == {
        "agg_pricing_summary", "sort_top_orders", "scalar_string_funcs"
    }
    assert all(t >= 0 for t in d["queries"].values()), "a smoke query failed"
    assert abs(d["value"] - sum(d["queries"].values())) < 0.01
    assert d["sf"] is not None
