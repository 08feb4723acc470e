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


def avro_transform(
    messages: DataFrame,
    topic: str,
    schema_id: int,
    tags: dict[str, str] | None = None,
    logtypeid: int | None = None,
) -> DataFrame:
    """R6: Confluent-framed Avro LogLine values."""

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


def write_kafka_stream(
    records: DataFrame,
    *,
    brokers: str,
    checkpoint: str,
    acks: int = 1,
    linger_ms: int = 1000,
    batch_size: int = 1000,
    compression: str | None = None,
):
    """R14-R16 parity via the Kafka sink's own producer options: batching
    (batch.size), group-commit (linger.ms), ack level — the knobs the
    reference exposes as --required.acks etc. Returns the StreamingQuery.

    Not exercised in tests (no broker in this environment); the projection
    feeding it is byte-golden-tested.
    """
    writer = (
        records.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("kafka.acks", str(acks))
        .option("kafka.linger.ms", str(linger_ms))
        .option("kafka.batch.size", str(batch_size))
        .option("checkpointLocation", checkpoint)
    )
    if compression:
        writer = writer.option("kafka.compression.type", compression)
    return writer.start()
