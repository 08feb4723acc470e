"""Streaming semantics tests: file-replay microbatches with memory sinks
(SURVEY §5.4) plus a live TCP/UDP round-trip through the custom syslog
data source."""

from __future__ import annotations

import socket
import time
import uuid

import pyspark.sql.functions as F
import pytest

from syslog_kafka_spark.sources.syslog_fixtures import SYSLOG_CORPUS
from syslog_kafka_spark.streaming.pipeline import (
    deduped_stream,
    incremental_dedup_stream,
    parsed_messages,
    sessionized_host_activity,
    stream_static_enrich,
    stream_stream_interval_join,
    windowed_severity_counts,
)


def _replay_stream(spark, tmp_path, lines):
    """File-source replay: write lines, stream-read them back."""
    d = tmp_path / "replay"
    d.mkdir()
    (d / "part-0.txt").write_text("\n".join(lines) + "\n")
    raw = spark.readStream.text(str(d))
    return raw.select(
        F.col("value").alias("line"),
        F.lit("test-collector").alias("source"),
        F.current_timestamp().alias("received_ts"),
    )


def _run_to_memory(df, name, mode="append"):
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    return name


def test_file_replay_parse_counts(spark, tmp_path):
    messages = _replay_stream(spark, tmp_path, SYSLOG_CORPUS)
    name = _run_to_memory(parsed_messages(messages), f"t{uuid.uuid4().hex[:8]}")
    out = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(out) == len(SYSLOG_CORPUS)
    parsed_ok = [r for r in out if r.pri is not None]
    assert len(parsed_ok) == 13  # corpus has 4 unparseable lines
    assert all(r.source == "test-collector" for r in out)


def test_windowed_severity_counts(spark, tmp_path):
    messages = _replay_stream(spark, tmp_path, SYSLOG_CORPUS)
    win = windowed_severity_counts(parsed_messages(messages), window="5 minutes")
    name = _run_to_memory(win, f"t{uuid.uuid4().hex[:8]}", mode="update")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # all lines arrive "now" → one 5-min window; severities grouped
    assert sum(r.n for r in rows) == len(SYSLOG_CORPUS)  # unparseable lines count too (severity NULL)
    assert {r.severity for r in rows} <= {0, 2, 5, 6, 7, None}


def test_sliding_window_counts(spark, tmp_path):
    messages = _replay_stream(spark, tmp_path, SYSLOG_CORPUS)
    win = windowed_severity_counts(
        parsed_messages(messages), window="10 minutes", slide="5 minutes"
    )
    name = _run_to_memory(win, f"t{uuid.uuid4().hex[:8]}", mode="update")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # sliding: every row lands in 2 overlapping windows
    assert sum(r.n for r in rows) == 2 * len(SYSLOG_CORPUS)


def test_streaming_dedup(spark, tmp_path):
    lines = [SYSLOG_CORPUS[0]] * 5 + [SYSLOG_CORPUS[7]] * 3
    messages = _replay_stream(spark, tmp_path, lines)
    name = _run_to_memory(deduped_stream(messages), f"t{uuid.uuid4().hex[:8]}")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) == 2


def test_session_window(spark, tmp_path):
    messages = _replay_stream(spark, tmp_path, SYSLOG_CORPUS)
    sess = sessionized_host_activity(parsed_messages(messages), gap="30 minutes")
    name = _run_to_memory(sess, f"t{uuid.uuid4().hex[:8]}", mode="complete")
    rows = spark.sql(f"SELECT * FROM {name} WHERE host = 'web01'").collect()
    # exactly one parseable web01 line in the corpus → one session
    assert len(rows) == 1 and rows[0].n_lines == 1


def test_stream_static_join(spark, tmp_path):
    dim = spark.createDataFrame(
        [("web01", "frontend"), ("db01", "database")], ["host", "tier"]
    )
    messages = _replay_stream(spark, tmp_path, SYSLOG_CORPUS)
    joined = stream_static_enrich(parsed_messages(messages), dim, "host")
    name = _run_to_memory(joined, f"t{uuid.uuid4().hex[:8]}")
    rows = spark.sql(f"SELECT * FROM {name} WHERE tier IS NOT NULL").collect()
    hosts = {r.host for r in rows}
    assert hosts == {"web01", "db01"}


def test_incremental_dedup_stream(spark, tmp_path):
    import hashlib

    # corpus already contains doc "alpha beta"; stream brings one known
    # doc, one novel doc repeated 3x (with whitespace variance), one more
    # novel doc
    known = "alpha beta"
    seen = spark.createDataFrame(
        [(hashlib.md5(known.encode()).hexdigest(),)], ["digest"]
    )
    lines = [known, "gamma  delta", "gamma delta", " Gamma Delta ", "epsilon"]
    d = tmp_path / "docs"
    d.mkdir()
    (d / "part-0.txt").write_text("\n".join(lines) + "\n")
    docs = (
        spark.readStream.text(str(d))
        .select(
            F.col("value").alias("text"),
            F.current_timestamp().alias("received_ts"),
        )
    )
    out = incremental_dedup_stream(docs, seen)
    name = _run_to_memory(out, f"t{uuid.uuid4().hex[:8]}")
    rows = spark.sql(f"SELECT text FROM {name}").collect()
    # known doc dropped; the three "gamma delta" variants collapse to one
    texts = sorted(r.text.strip().lower().replace("  ", " ") for r in rows)
    assert texts == ["epsilon", "gamma delta"]


def _replay_keyed_stream(spark, tmp_path, subdir, ts_col, lines):
    """CSV-ish replay with explicit event times: 'key,2024-01-01 00:00:00'."""
    d = tmp_path / subdir
    d.mkdir()
    (d / "part-0.txt").write_text("\n".join(lines) + "\n")
    raw = spark.readStream.text(str(d))
    return raw.select(
        F.split("value", ",")[0].alias("k"),
        F.to_timestamp(F.split("value", ",")[1]).alias(ts_col),
    )


def test_stream_stream_interval_join(spark, tmp_path):
    alerts = _replay_keyed_stream(
        spark, tmp_path, "alerts", "alert_ts",
        ["web01,2024-01-01 00:00:00", "db01,2024-01-01 01:00:00"],
    )
    deploys = _replay_keyed_stream(
        spark, tmp_path, "deploys", "deploy_ts",
        [
            "web01,2024-01-01 00:02:00",  # within 5 min of the web01 alert
            "web01,2024-01-01 00:20:00",  # outside the interval -> no match
            "db01,2024-01-01 01:04:00",   # within 5 min of the db01 alert
            "app01,2024-01-01 00:01:00",  # key never alerts -> no match
        ],
    )
    joined = stream_stream_interval_join(
        alerts, deploys, "k",
        left_time="alert_ts", right_time="deploy_ts", interval="5 minutes",
    )
    name = _run_to_memory(joined, f"t{uuid.uuid4().hex[:8]}")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert {(r.k, r.deploy_ts.minute) for r in rows} == {("web01", 2), ("db01", 4)}


def test_stream_stream_join_requires_distinct_time_cols(spark, tmp_path):
    df = _replay_keyed_stream(spark, tmp_path, "x", "ts", ["a,2024-01-01 00:00:00"])
    with pytest.raises(ValueError, match="distinct"):
        stream_stream_interval_join(df, df, "k", left_time="ts", right_time="ts")


def test_foreach_batch_collects(spark, tmp_path):
    seen: list[int] = []
    messages = _replay_stream(spark, tmp_path, SYSLOG_CORPUS[:5])
    q = (
        messages.writeStream.foreachBatch(lambda df, epoch: seen.append(df.count()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sum(seen) == 5


def test_line_buffer_commit_trims_with_absolute_offsets():
    """commit() low-water-mark trimming: committed prefixes are freed but
    absolute offsets keep working (no index shift for in-flight batches)."""
    from syslog_kafka_spark.sources.syslog_source import _LineBuffer

    buf = _LineBuffer()
    for i in range(10):
        buf.append(f"line{i}")
    assert buf.snapshot_len() == 10
    assert [l for l, _ in buf.range(3, 6)] == ["line3", "line4", "line5"]

    buf.truncate_to(6)  # batches [0,6) committed
    assert buf.snapshot_len() == 10  # absolute offsets unchanged
    assert [l for l, _ in buf.range(6, 10)] == [f"line{i}" for i in range(6, 10)]
    assert buf.range(0, 6) == []  # committed prefix is gone
    assert len(buf._lines) == 4  # memory actually freed

    buf.append("line10")
    assert buf.snapshot_len() == 11
    assert [l for l, _ in buf.range(10, 11)] == ["line10"]
    # idempotent / stale commits are safe
    buf.truncate_to(3)
    assert buf.snapshot_len() == 11
    buf.truncate_to(11)
    assert buf.snapshot_len() == 11 and buf.range(0, 11) == []


@pytest.mark.parametrize("protocol", ["tcp", "udp"])
def test_syslog_socket_source_live(spark, tmp_path, protocol):
    """Live round-trip: register the custom source, send real packets,
    assert the rows (R1-R3 parity: arrival stamping, collector hostname)."""
    from syslog_kafka_spark.sources.syslog_source import SyslogDataSource

    import os

    spark.dataSource.register(SyslogDataSource)
    # pid-derived port avoids collisions with lingering listeners from
    # other pytest processes on this machine
    port = 20000 + (os.getpid() % 10000) + (0 if protocol == "tcp" else 1)
    df = (
        spark.readStream.format("syslog")
        .option("host", "127.0.0.1")
        .option("port", str(port))
        .option("protocol", protocol)
        .load()
    )
    name = f"t{uuid.uuid4().hex[:8]}"
    q = df.writeStream.format("memory").queryName(name).start()

    payload = b"<34>1 2003-10-11T22:14:15.003Z h su - ID23 - live line one\n<13>Aug 13 03:38:00 web01 nginx[912]: live line two\n"

    def send() -> bool:
        try:
            if protocol == "tcp":
                with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
                    s.sendall(payload)
            else:
                s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
                s.sendto(payload, ("127.0.0.1", port))
                s.close()
            return True
        except OSError:
            return False  # listener not up yet

    try:
        time.sleep(2)  # listener startup inside the stream reader
        sent = send()
        deadline = time.time() + 45
        rows = []
        while time.time() < deadline:
            q.processAllAvailable()
            # re-sent lines differ only in received_ts; DISTINCT on the
            # stable columns dedups them
            rows = spark.sql(f"SELECT DISTINCT line, source FROM {name}").collect()
            if len(rows) >= 2:
                break
            time.sleep(1.0)
            sent = send() or sent
    finally:
        q.stop()
    assert len(rows) == 2, f"expected 2 rows, got {rows}"
    assert {r.line for r in rows} == {
        "<34>1 2003-10-11T22:14:15.003Z h su - ID23 - live line one",
        "<13>Aug 13 03:38:00 web01 nginx[912]: live line two",
    }
    assert all(r.source == socket.gethostname() for r in rows)
    stamped = spark.sql(f"SELECT received_ts FROM {name}").collect()
    assert stamped and all(r.received_ts is not None for r in stamped)


def test_stateful_host_profiles_across_batches(spark, tmp_path):
    """applyInPandasWithState: state persists across microbatches (two file
    drops processed as separate batches via maxFilesPerTrigger=1)."""
    from syslog_kafka_spark.streaming.stateful import host_profiles

    d = tmp_path / "stateful"
    d.mkdir()
    line = "<13>Aug 13 03:38:00 web01 nginx[912]: GET /index.html 200"
    (d / "a.txt").write_text((line + "\n") * 3)
    (d / "b.txt").write_text((line + "\n") * 2)

    raw = spark.readStream.option("maxFilesPerTrigger", "1").text(str(d))
    messages = raw.select(
        F.col("value").alias("line"),
        F.lit("collector").alias("source"),
        F.current_timestamp().alias("received_ts"),
    )
    profiles = host_profiles(parsed_messages(messages))
    name = f"t{uuid.uuid4().hex[:8]}"
    q = profiles.writeStream.format("memory").queryName(name).outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(f"SELECT * FROM {name} WHERE host='web01' ORDER BY total_lines").collect()
    # one emission per microbatch touching the host; the LAST total is the
    # running count across both batches (3 then 5) in either file order
    assert rows[-1].total_lines == 5
    assert rows[-1].max_severity == 5
    assert len(rows) == 2


def test_available_now_trigger_drains_and_stops(spark, tmp_path):
    """Trigger.AvailableNow: process everything present, then stop on its
    own — the batch-draining mode a scheduled backfill job uses (vs the
    always-on microbatch loop)."""
    import time

    messages = _replay_stream(spark, tmp_path, SYSLOG_CORPUS)
    name = f"t{uuid.uuid4().hex[:8]}"
    q = (
        parsed_messages(messages)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 60
    while q.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert not q.isActive, "availableNow query did not self-terminate"
    assert spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n == len(
        SYSLOG_CORPUS
    )


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: a file-sink query driven by
    availableNow drains what exists, stops, and — restarted with the SAME
    checkpoint — processes only files that arrived since. The parquet
    output must contain every line exactly once."""
    import time

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("\n".join(SYSLOG_CORPUS[:8]) + "\n")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.text(str(src))
            .select(
                F.col("value").alias("line"),
                F.lit("resume-test").alias("source"),
                F.current_timestamp().alias("received_ts"),
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 60
        while q.isActive and time.time() < deadline:
            time.sleep(0.5)
        assert not q.isActive

    run_once()
    assert spark.read.parquet(out).count() == 8

    (src / "b.txt").write_text("\n".join(SYSLOG_CORPUS[8:12]) + "\n")
    run_once()

    lines = [r.line for r in spark.read.parquet(out).collect()]
    assert len(lines) == 12, "restart reprocessed or dropped data"
    assert sorted(lines) == sorted(SYSLOG_CORPUS[:12])


def test_watermark_drops_late_rows_across_microbatches(spark, tmp_path):
    """Late-data drop semantics end to end: a row older than the
    watermark, arriving in a LATER microbatch, must be excluded from its
    (already-finalized) window — while an equally-old row in the FIRST
    batch counts. maxFilesPerTrigger=1 pins the file→microbatch mapping;
    the watermark used by batch N is the one committed after batch N-1."""
    src = tmp_path / "late_src"
    src.mkdir()
    # Batch 1: two rows in [10:00,10:10) and one at 11:00 that drags the
    # watermark to 10:45 (11:00 - 15 min) once the batch commits.
    (src / "f1.csv").write_text(
        "2024-03-01 10:00:00,u1\n2024-03-01 10:05:00,u2\n2024-03-01 11:00:00,u3\n"
    )
    raw = (
        spark.readStream.schema("ts TIMESTAMP, user_id STRING")
        .option("maxFilesPerTrigger", "1")
        .csv(str(src))
    )
    agg = (
        raw.withWatermark("ts", "15 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .count()
    )
    name = f"t{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
        # Batch 2: one LATE row for the finalized [10:00,10:10) window
        # (10:01 < watermark 10:45 → dropped) and one on-time row.
        (src / "f2.csv").write_text(
            "2024-03-01 10:01:00,u4\n2024-03-01 11:10:00,u5\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r["w"].start.strftime("%H:%M"): r["count"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # The finalized first window counts only the two on-time rows — the
    # late u4 row did not resurrect or re-emit it.
    assert rows.get("10:00") == 2, rows


def test_stream_cms_state_is_bounded_and_mass_preserving(spark, sf_dir):
    """The streamed sketch holds ≤4×2048 cells regardless of stream
    size, and each of the 4 rows conserves total token mass (every
    token increments exactly one bucket per row)."""
    from syslog_kafka_spark.functions.text import token_count
    from syslog_kafka_spark.plans.stream_gated import stream_cms_sketch_build
    from syslog_kafka_spark.sources.readers import load_tables

    rows = stream_cms_sketch_build(spark, sf_dir).collect()
    assert len(rows) <= 4 * 2048
    n_tokens = (
        load_tables(spark, sf_dir)
        .documents.agg(F.sum(token_count("text")))
        .collect()[0][0]
    )
    for r in range(4):
        assert sum(x.cnt for x in rows if x.r == r) == n_tokens
