"""Kafka consume path: readStream → decode LogLine values.

Closes the loop the reference only half-owns (it produces; its vendored
client library ships the decoder — go-kafka-avro KafkaAvroDecoder,
avro_encoder_decoder.go:81-106). Decode runs as an Arrow-batched pandas
UDF over the binary value column; everything else is the built-in Kafka
source (offsets, partitions, exactly-once bookkeeping).

Not exercised against a live broker in this environment; the decode UDFs
are round-trip property-tested against the encoders.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.pandas.functions import pandas_udf

from syslog_kafka_spark.encode.decode import decode_confluent, decode_logline_proto

# decoded LogLine as a Spark struct (Avro flavor: timings = records)
_AVRO_OUT = (
    "struct<schema_id: int, line: string, source: string, tag: map<string,string>, "
    "logtypeid: bigint, timings: array<struct<eventName: string, value: bigint>>>"
)
_PROTO_OUT = (
    "struct<line: string, source: string, tag: map<string,string>, "
    "logtypeid: bigint, timings: array<bigint>>"
)


@pandas_udf(_AVRO_OUT)
def decode_confluent_udf(values: pd.Series) -> pd.DataFrame:
    rows = []
    for v in values:
        sid, rec = decode_confluent(bytes(v))
        rows.append(
            {
                "schema_id": sid,
                "line": rec["line"],
                "source": rec["source"],
                "tag": rec["tag"],
                "logtypeid": rec["logtypeid"],
                "timings": rec["timings"],
            }
        )
    return pd.DataFrame(rows)


@pandas_udf(_PROTO_OUT)
def decode_proto_udf(values: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([decode_logline_proto(bytes(v)) for v in values])


def read_kafka_loglines(
    spark: SparkSession,
    *,
    brokers: str,
    topic: str,
    encoding: str = "string",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Streaming Kafka source with the LogLine value decoded per encoding.

    Returns columns (topic, partition, offset, timestamp, key, logline)
    where ``logline`` is a struct for avro/proto or the raw string for
    string encoding.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    base = raw.select("topic", "partition", "offset", "timestamp", "key", "value")
    if encoding == "string":
        return base.withColumn("logline", F.col("value").cast("string")).drop("value")
    if encoding == "avro":
        return base.withColumn("logline", decode_confluent_udf(F.col("value"))).drop("value")
    if encoding == "proto":
        return base.withColumn("logline", decode_proto_udf(F.col("value"))).drop("value")
    raise ValueError(f"unknown encoding {encoding!r}")
