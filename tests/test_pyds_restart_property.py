"""Property test for the streaming reader's checkpoint-restart clamp
(sources/pyds.py): for ANY committed offset and any interleaving of a
crash-restart, the restarted reader delivers exactly the uncommitted
suffix — no duplicates, no losses — even though Spark calls
latestOffset() on the fresh reader BEFORE handing it the checkpointed
start offset.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from syslog_kafka_spark.sources.pyds import SyslogTextStreamReader

N_LINES = 40


@given(
    committed=st.integers(min_value=0, max_value=N_LINES),
    batch_lines=st.integers(min_value=1, max_value=12),
    chain_from_regressed_end=st.booleans(),
)
@settings(max_examples=120, deadline=None)
def test_restart_delivers_exactly_the_uncommitted_suffix(
    tmp_path_factory, committed, batch_lines, chain_from_regressed_end
):
    p = tmp_path_factory.mktemp("pyds") / "f.log"
    p.write_bytes(b"".join(b"line %d\n" % i for i in range(N_LINES)))
    reader = SyslogTextStreamReader({"path": str(p), "batchlines": batch_lines})

    # Spark's restart sequence: latestOffset() first (fresh reader knows
    # nothing), then partitions(checkpointed_start, that_end).
    end0 = reader.latestOffset()["line"]
    (part0,) = reader.partitions({"line": committed}, {"line": end0})
    got = [idx for _, line in reader.read(part0) for idx in [int(line.split()[1])]]
    assert all(i >= committed for i in got), "regressing batch re-read committed lines"

    # Subsequent batches chain either from the regressed end (worst case)
    # or from the committed offset — both must converge without dups.
    prev = end0 if chain_from_regressed_end else max(end0, committed)
    seen = list(got)
    for _ in range(2 * N_LINES):
        nxt = reader.latestOffset()["line"]
        if nxt == prev and nxt >= N_LINES:
            break
        (part,) = reader.partitions({"line": prev}, {"line": nxt})
        seen.extend(int(line.split()[1]) for _, line in reader.read(part))
        reader.commit({"line": nxt})
        prev = nxt
    assert seen == list(range(committed, N_LINES)), (
        f"committed={committed} batch={batch_lines} got {seen[:10]}..."
    )


@given(
    committed=st.integers(min_value=1, max_value=N_LINES),
    batch_lines=st.integers(min_value=1, max_value=12),
    n_restarts=st.integers(min_value=2, max_value=4),
    explicit_hwmpath=st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_hwm_sidecar_survives_repeated_restarts(
    tmp_path_factory, committed, batch_lines, n_restarts, explicit_hwmpath
):
    """The durability sidecar makes exactly-once survive ANY restart
    count: the clamp alone lets the first post-restart latestOffset()
    regress below the committed start (Spark would persist that regressed
    end to its offset log, so a SECOND crash resumes from it and
    re-delivers); the sidecar floor makes latestOffset() monotone across
    incarnations. Exercised through BOTH contracts: the explicit
    ``hwmpath`` option and the round-7 default path derived from
    ``checkpointLocation`` (``<dir>/_hwm``)."""
    d = tmp_path_factory.mktemp("pyds_hwm")
    p = d / "f.log"
    p.write_bytes(b"".join(b"line %d\n" % i for i in range(N_LINES)))
    opts = {"path": str(p), "batchlines": batch_lines}
    if explicit_hwmpath:
        opts["hwmpath"] = str(d / "hwm")
    else:
        # Default-on tier: only the (read-side mirror of the) checkpoint
        # dir is given; the sidecar must land at <dir>/_hwm on its own.
        opts["checkpointlocation"] = str(d / "ckpt")

    # Incarnation 0 runs to `committed`, committing as it goes (writes hwm).
    reader = SyslogTextStreamReader(opts)
    prev, seen = 0, []
    while prev < committed:
        nxt = min(reader.latestOffset()["line"], committed)
        (part,) = reader.partitions({"line": prev}, {"line": nxt})
        seen.extend(int(line.split()[1]) for _, line in reader.read(part))
        reader.commit({"line": nxt})
        prev = nxt

    # Crash/restart n times; each fresh incarnation's FIRST latestOffset()
    # answer must already sit at-or-above the committed floor (no
    # regressed end ever reaches Spark's offset log), and chaining from
    # whatever it answers never duplicates a committed line.
    for _ in range(n_restarts):
        reader = SyslogTextStreamReader(opts)
        end0 = reader.latestOffset()["line"]
        assert end0 >= prev, f"regressed end {end0} < committed {prev}"
        (part,) = reader.partitions({"line": prev}, {"line": end0})
        got = [int(line.split()[1]) for _, line in reader.read(part)]
        assert all(i >= prev for i in got)
        seen.extend(got)
        reader.commit({"line": end0})
        prev = end0

    # Drain to EOF and verify the global exactly-once property.
    while prev < N_LINES:
        nxt = reader.latestOffset()["line"]
        (part,) = reader.partitions({"line": prev}, {"line": nxt})
        seen.extend(int(line.split()[1]) for _, line in reader.read(part))
        reader.commit({"line": nxt})
        prev = nxt
    assert seen == list(range(N_LINES))
    if not explicit_hwmpath:
        assert (d / "ckpt" / "_hwm").exists(), "default sidecar not written"


def test_hwm_option_resolution_tiers(tmp_path):
    """Option algebra: explicit hwmpath wins over checkpointLocation;
    'off'/empty disables even with a checkpoint dir; neither option →
    clamp-only (no sidecar)."""
    resolve = SyslogTextStreamReader._resolve_hwm_path
    ckpt = str(tmp_path / "ck")
    assert resolve({"checkpointlocation": ckpt}) == str(tmp_path / "ck" / "_hwm")
    assert resolve({"hwmpath": "/x/hwm", "checkpointlocation": ckpt}) == "/x/hwm"
    for off in ("off", "", "  ", "None", "FALSE"):
        assert resolve({"hwmpath": off, "checkpointlocation": ckpt}) is None
    assert resolve({}) is None
