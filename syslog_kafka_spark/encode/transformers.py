"""Message transformers: SyslogMessage rows → Kafka-sink projections.

Reference parity, one function per transformer:
- string_transform  = simpleTransformFunc (syslog/syslog_producer.go:209-211)
- avro_transform    = avroTransformer (syslog.go:146-161): LogLine{line,
  source, static tag map, optional logtypeid, timings=[{"received", ms}]},
  Confluent-framed Avro value.
- proto_transform   = protobufTransformer (syslog.go:163-182): proto
  LogLine with timings=[received_ms, sent_ms] (two bare longs,
  syslog.go:174) and repeated Tag pairs.

Encoders run as Arrow-batched pandas UDFs (the byte formats are not
expressible as Catalyst expressions); everything around them — the LogLine
struct assembly, tag constants, timestamps — is built-in columns, so only
the final bytes step leaves the JVM. Output schema is the Kafka sink row
contract: key BINARY, value BINARY, topic STRING [, partition INT].
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.pandas.functions import pandas_udf

from syslog_kafka_spark.encode.avro_binary import encode_logline_confluent
from syslog_kafka_spark.encode.proto_wire import encode_logline_proto
from syslog_kafka_spark.functions.hashes import fnv1a32_partition


def _opt(v):
    """Arrow/pandas null → None (nullable ints surface as float NaN)."""
    if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
        return None
    return v


def _opt_int(v):
    v = _opt(v)
    return None if v is None else int(v)


def string_transform(messages: DataFrame, topic: str) -> DataFrame:
    """R5: value = raw line bytes (StringSerializer parity)."""
    return messages.select(
        F.lit(None).cast("binary").alias("key"),
        F.col("line").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    )


def _logline_rows(
    messages: DataFrame,
    tags: dict[str, str] | None,
    logtypeid: int | None,
    proto_timings: bool,
) -> DataFrame:
    """Assemble the LogLine struct column (all Catalyst expressions)."""
    tag_col = (
        F.create_map(*[F.lit(x) for kv in sorted(tags.items()) for x in kv])
        if tags
        else F.lit(None).cast("map<string,string>")
    )
    logtype_col = F.lit(logtypeid).cast("bigint")
    received_ms = (F.unix_micros(F.col("received_ts").cast("timestamp")) / 1000).cast("bigint")
    if proto_timings:
        # [received, sent] bare epoch-ms pair (syslog.go:174)
        timings = F.array(
            received_ms, (F.unix_micros(F.current_timestamp()) / 1000).cast("bigint")
        )
    else:
        # [{"received", ms}] single Timing record (syslog.go:155-158)
        timings = F.array(
            F.struct(F.lit("received").alias("eventName"), received_ms.alias("value"))
        )
    return messages.select(
        F.struct(
            F.col("line"),
            F.col("source"),
            tag_col.alias("tag"),
            logtype_col.alias("logtypeid"),
            timings.alias("timings"),
        ).alias("logline")
    )


# Per-session probe result for the JVM spark-avro module. The functions
# in pyspark.sql.avro.functions are thin wrappers over the EXTERNAL
# spark-avro jar (org.apache.spark:spark-avro_2.13) — the import always
# succeeds, so availability must be probed by evaluating one row.
# Weak-keyed by the session so a recycled id() can never inherit a dead
# session's verdict. A failed probe pins the session to the Python
# fallback — always CORRECT, just slower; deliberate, since re-probing a
# genuinely jar-less cluster on every encode would be worse.
_JVM_AVRO: WeakKeyDictionary = WeakKeyDictionary()


def jvm_avro_available(spark) -> bool:
    """True iff the spark-avro jar is on the session's classpath.

    PROBE RESULT in this build environment: the bundled Spark 4.1
    distribution ships avro-1.12 core jars but NOT the spark-avro
    connector (no spark-avro_*.jar under pyspark/jars; no network to
    fetch it), so this returns False here and avro_transform uses the
    Arrow-batched Python encoder. On any cluster with the connector
    (the normal production install), the JVM path engages automatically
    and the parity test in tests/test_encodings.py gates byte equality.
    """
    if spark not in _JVM_AVRO:
        try:
            from pyspark.sql.avro.functions import to_avro

            spark.range(1).select(
                to_avro(F.struct(F.lit("x").alias("a"))).alias("b")
            ).collect()
            _JVM_AVRO[spark] = True
        except Exception:
            _JVM_AVRO[spark] = False
    return _JVM_AVRO[spark]


def avro_transform(
    messages: DataFrame,
    topic: str,
    schema_id: int,
    tags: dict[str, str] | None = None,
    logtypeid: int | None = None,
    use_jvm: bool | None = None,
) -> DataFrame:
    """R6: Confluent-framed Avro LogLine values.

    Two encode paths with byte-identical output (same writer schema,
    LOGLINE_AVSC; tags pre-sorted at struct construction so map entry
    order matches the Python writer's sorted-key convention):

    - PRIMARY (jar present): JVM ``to_avro`` + a literal Confluent
      header concat — whole-stage codegen, no Python in the sink's hot
      path. At 100 TB the encode projection dominates sink CPU, so
      JVM-side beats Arrow-Python whenever the spark-avro module exists.
    - FALLBACK (this sandbox): Arrow-batched pandas UDF over the pure-
      Python Avro fold (encode/avro_binary.py).

    ``use_jvm=None`` auto-probes per session via jvm_avro_available.
    """
    if use_jvm is None:
        use_jvm = jvm_avro_available(messages.sparkSession)
    if use_jvm:
        import struct as _struct

        from pyspark.sql.avro.functions import to_avro

        from syslog_kafka_spark.encode.avro_binary import (
            CONFLUENT_MAGIC,
            logline_schema_json,
        )

        rows = _logline_rows(messages, tags, logtypeid, proto_timings=False)
        header = CONFLUENT_MAGIC + _struct.pack(">I", schema_id)
        return rows.select(
            F.lit(None).cast("binary").alias("key"),
            F.concat(
                F.lit(header), to_avro(F.col("logline"), logline_schema_json())
            ).alias("value"),
            F.lit(topic).alias("topic"),
        )

    @pandas_udf("binary")
    def enc(rows: pd.DataFrame) -> pd.Series:
        # struct columns arrive as a DataFrame of fields (Arrow batch)
        return rows.apply(
            lambda r: encode_logline_confluent(
                {
                    "line": _opt(r["line"]),
                    "source": _opt(r["source"]),
                    "tag": dict(r["tag"]) if _opt(r["tag"]) is not None else None,
                    "logtypeid": _opt_int(r["logtypeid"]),
                    "timings": [
                        {"eventName": t["eventName"], "value": int(t["value"])}
                        for t in r["timings"]
                    ]
                    if _opt(r["timings"]) is not None
                    else None,
                },
                schema_id,
            ),
            axis=1,
        )

    rows = _logline_rows(messages, tags, logtypeid, proto_timings=False)
    return rows.select(
        F.lit(None).cast("binary").alias("key"),
        enc(F.col("logline")).alias("value"),
        F.lit(topic).alias("topic"),
    )


def proto_transform(
    messages: DataFrame,
    topic: str,
    tags: dict[str, str] | None = None,
    logtypeid: int | None = None,
) -> DataFrame:
    """R7: bare proto.Marshal LogLine values (no registry framing)."""

    @pandas_udf("binary")
    def enc(rows: pd.DataFrame) -> pd.Series:
        return rows.apply(
            lambda r: encode_logline_proto(
                {
                    "line": _opt(r["line"]),
                    "source": _opt(r["source"]),
                    "tag": dict(r["tag"]) if _opt(r["tag"]) is not None else None,
                    "logtypeid": _opt_int(r["logtypeid"]),
                    "timings": [int(t) for t in r["timings"]]
                    if _opt(r["timings"]) is not None
                    else None,
                }
            ),
            axis=1,
        )

    rows = _logline_rows(messages, tags, logtypeid, proto_timings=True)
    return rows.select(
        F.lit(None).cast("binary").alias("key"),
        enc(F.col("logline")).alias("value"),
        F.lit(topic).alias("topic"),
    )


def with_fnv1a_partition(records: DataFrame, key_col: str, num_partitions: int) -> DataFrame:
    """R11 parity: explicit partition column = abs(int32(fnv1a32(key))) % n
    so the Kafka sink routes exactly like the reference's HashPartitioner."""
    return records.withColumn("partition", fnv1a32_partition(key_col, num_partitions).cast("int"))


def with_random_partition(
    records: DataFrame, num_partitions: int, seed: int | None = None
) -> DataFrame:
    """R12 parity: RandomPartitioner (reference partitioner.go:46-55,
    rand.Int31n(len(partitions))) — a uniform random partition per record.
    ``seed`` pins the stream for deterministic tests; production use leaves
    it None (Spark picks a random seed per query, like the reference's
    time-seeded rand)."""
    if num_partitions <= 0:
        raise ValueError(f"num_partitions must be positive, got {num_partitions}")
    rnd = F.rand(seed) if seed is not None else F.rand()
    return records.withColumn(
        "partition", F.floor(rnd * num_partitions).cast("int")
    )


def kafka_writer_options(
    *,
    brokers: str,
    acks: int = 1,
    linger_ms: int = 1000,
    batch_size: int = 1000,
    acks_timeout_ms: int | None = None,
    compression: str | None = None,
) -> dict[str, str]:
    """The Kafka sink option map for the reference's producer knob set
    (kafka_producer.go:57-67: acks / timeout.ms / linger / batch.size /
    compression.type / bootstrap.servers). Split out from the writer so the
    contract can be asserted in tests without a broker."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "kafka.acks": str(acks),
        "kafka.linger.ms": str(linger_ms),
        "kafka.batch.size": str(batch_size),
    }
    if acks_timeout_ms is not None:
        # reference AckTimeoutMs / timeout.ms → producer request.timeout.ms
        opts["kafka.request.timeout.ms"] = str(acks_timeout_ms)
    if compression:
        opts["kafka.compression.type"] = compression
    return opts


def write_kafka_stream(
    records: DataFrame,
    *,
    brokers: str,
    checkpoint: str,
    acks: int = 1,
    linger_ms: int = 1000,
    batch_size: int = 1000,
    acks_timeout_ms: int | None = None,
    compression: str | None = None,
):
    """R14-R16 parity via the Kafka sink's own producer options: batching
    (batch.size), group-commit (linger.ms), ack level + timeout — the knobs
    the reference exposes as --required.acks / --acks.timeout. Returns the
    StreamingQuery.

    Not exercised against a live broker in tests (none in this
    environment); the projection feeding it is byte-golden-tested and the
    option map is contract-tested via kafka_writer_options."""
    writer = records.writeStream.format("kafka").option("checkpointLocation", checkpoint)
    for k, v in kafka_writer_options(
        brokers=brokers,
        acks=acks,
        linger_ms=linger_ms,
        batch_size=batch_size,
        acks_timeout_ms=acks_timeout_ms,
        compression=compression,
    ).items():
        writer = writer.option(k, v)
    return writer.start()
