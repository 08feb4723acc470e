"""Gated Kafka wire round trip (no broker needed): encode → decode → hash.

The reference's produce path emits Confluent-framed Avro or bare proto2
LogLine bytes (/root/reference syslog.go:146-182; go-kafka-avro
avro_encoder_decoder.go:62-78); its vendored client owns the inverse
decode (avro_encoder_decoder.go:81-106). This gate drives OUR inverse
pair end to end through the REAL consume-path UDFs
(sources/kafka_source.decode_confluent_udf / decode_proto_udf — the same
columns a readStream.format("kafka") consumer gets), over a deterministic
LogLine fixture derived from the syslog corpus:

  fixture records --golden encoders--> wire bytes --pandas UDF decode-->
  recovered columns --hash-compare--> DuckDB VALUES of the SAME fixture

A hash match proves decode ∘ encode == identity for every field shape in
the fixture (null/absent fields, tag maps, avro record-timings vs proto
bare-long timings, the Confluent magic+schema-id frame) — R9/R10
semantics, batch-style. The UDFs are Arrow-batched; at scale this is one
narrow map over the Kafka value column, no shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from syslog_kafka_spark.plans.registry import query
from syslog_kafka_spark.sources.syslog_fixtures import SYSLOG_CORPUS

SCHEMA_ID = 9
_T0 = 1_700_000_000_000  # fixed epoch ms — arrival stamps must be deterministic


def logline_fixture() -> list[dict]:
    """Deterministic LogLine records in the reference's avroTransformer
    shape (syslog.go:146-161): line, source, tag map, logtypeid, one
    'received' timing. Field presence varies so the round trip covers
    null unions; the >8 KB corpus line is excluded (byte-golden tests own
    the long-payload case) to keep the oracle VALUES readable."""
    recs = []
    for i, line in enumerate(l for l in SYSLOG_CORPUS if len(l) < 200):
        recs.append(
            {
                "line": line,
                "source": f"host-{i % 5}",
                "tag": None if i % 7 == 3 else {"dc": "ams", "seq": str(i)},
                "logtypeid": None if i % 5 == 4 else i,
                "timings": [{"eventName": "received", "value": _T0 + i}],
            }
        )
    return recs


def _sql_str(s: str | None) -> str:
    return "NULL" if s is None else "'" + s.replace("'", "''") + "'"


def _flat_tag(col):
    """Decoded tag map → deterministic 'k=v|k=v' string (sorted by key).
    Emitted flat because DuckDB's client represents MAP values in a
    different shape than Spark's, which would hash-mismatch even when the
    maps are equal — house convention, same as scalar_map_funcs."""
    return F.array_join(
        F.transform(
            F.array_sort(F.map_entries(col)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        "|",
    )


def _roundtrip_oracle() -> str:
    """The fixture itself as a VALUES relation — the expected fixed point
    of decode ∘ encode. Pure constants: DuckDB needs no codec and no
    filesystem."""
    rows = []
    for i, rec in enumerate(logline_fixture()):
        tag = _sql_str(
            None
            if rec["tag"] is None
            else "|".join(f"{k}={v}" for k, v in sorted(rec["tag"].items()))
        )
        logtypeid = "CAST(NULL AS BIGINT)" if rec["logtypeid"] is None else str(rec["logtypeid"])
        line = _sql_str(rec["line"])
        src = _sql_str(rec["source"])
        t = rec["timings"][0]["value"]
        # Timing collections are emitted |-flattened (house convention, same
        # as tag_flat): the driver canonicalizes through pandas, and real
        # list columns break its sort_values-based ordering.
        rows.append(
            f"({i}, 'avro', {SCHEMA_ID}, {line}, {src}, {tag}, {logtypeid}, "
            f"'received', '{t}')"
        )
        rows.append(
            f"({i}, 'proto', CAST(NULL AS INT), {line}, {src}, {tag}, {logtypeid}, "
            f"CAST(NULL AS VARCHAR), '{t}|{t + 500}')"
        )
    values = ", ".join(rows)
    return f"""
        SELECT rec_id, encoding, schema_id, line, source, tag_flat, logtypeid,
               timing_events, timing_values
        FROM (VALUES {values}) AS t(rec_id, encoding, schema_id, line, source,
                                    tag_flat, logtypeid, timing_events, timing_values)
        ORDER BY encoding, rec_id
    """


@query("kafka_decode_roundtrip", family="kafka", oracle=_roundtrip_oracle())
def kafka_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-format round trip through the Kafka consume path: the fixture
    is encoded with the golden encoders (Confluent-framed Avro with magic
    0x00 + big-endian schema id, and bare proto2 — the reference's two
    binary sinks), then decoded by the readStream-side pandas UDFs, and
    the recovered fields are hashed against the fixture constants. Proto
    timings follow the reference's protobufTransformer (syslog.go:163-182):
    two bare longs, received + sent."""
    from syslog_kafka_spark.encode.avro_binary import encode_logline_confluent
    from syslog_kafka_spark.encode.proto_wire import encode_logline_proto
    from syslog_kafka_spark.sources.kafka_source import (
        decode_confluent_udf,
        decode_proto_udf,
    )

    recs = logline_fixture()
    avro_rows = [
        (i, bytearray(encode_logline_confluent(rec, SCHEMA_ID))) for i, rec in enumerate(recs)
    ]
    proto_rows = [
        (
            i,
            bytearray(
                encode_logline_proto(
                    {
                        **{k: rec[k] for k in ("line", "source", "tag", "logtypeid")},
                        "timings": [
                            rec["timings"][0]["value"],
                            rec["timings"][0]["value"] + 500,
                        ],
                    }
                )
            ),
        )
        for i, rec in enumerate(recs)
    ]

    # createDataFrame slices a local list across defaultParallelism (32)
    # partitions — ~2 wire records per task means every decode pays a
    # separate Arrow Python-worker round trip, and the orderBy's
    # range-sampling pass runs the whole chain again. Parallelize the
    # fixture as ONE slice instead so each decode is a single task over a
    # single Arrow batch (measured r13: warm 1.3 s -> 0.67 s; NOT
    # coalesce(1), which computes the 32 pickled parent slices serially
    # inside one task — 6 s — and not repartition(1), which keeps the
    # 32-task stage plus a shuffle; guide §4.2).
    def _one_slice(rows: list, ddl: str):
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1),
            ddl,
        )

    avro = (
        _one_slice(avro_rows, "rec_id int, value binary")
        .withColumn("logline", decode_confluent_udf(F.col("value")))
        .select(
            "rec_id",
            F.lit("avro").alias("encoding"),
            F.col("logline.schema_id").alias("schema_id"),
            F.col("logline.line").alias("line"),
            F.col("logline.source").alias("source"),
            _flat_tag(F.col("logline.tag")).alias("tag_flat"),
            F.col("logline.logtypeid").alias("logtypeid"),
            F.array_join(
                F.transform("logline.timings", lambda x: x["eventName"]), "|"
            ).alias("timing_events"),
            F.array_join(
                F.transform("logline.timings", lambda x: x["value"].cast("string")), "|"
            ).alias("timing_values"),
        )
    )
    proto = (
        _one_slice(proto_rows, "rec_id int, value binary")
        .withColumn("logline", decode_proto_udf(F.col("value")))
        .select(
            "rec_id",
            F.lit("proto").alias("encoding"),
            F.lit(None).cast("int").alias("schema_id"),
            F.col("logline.line").alias("line"),
            F.col("logline.source").alias("source"),
            _flat_tag(F.col("logline.tag")).alias("tag_flat"),
            F.col("logline.logtypeid").alias("logtypeid"),
            F.lit(None).cast("string").alias("timing_events"),
            F.array_join(
                F.transform("logline.timings", lambda x: x.cast("string")), "|"
            ).alias("timing_values"),
        )
    )
    return avro.unionByName(proto).orderBy("encoding", "rec_id")


@query(
    "kafka_partitioner_histogram",
    family="kafka",
    oracle="""
        WITH k AS (
          SELECT 'key-' || CAST(o_orderkey AS VARCHAR) AS key
          FROM orders WHERE o_orderkey <= 2000
        ),
        h AS (
          SELECT key,
                 list_reduce(
                   list_prepend(CAST(2166136261 AS BIGINT),
                     list_transform(generate_series(1, length(key)),
                                    i -> CAST(ord(substr(key, i, 1)) AS BIGINT))),
                   (acc, b) -> (xor(acc, b) * 16777619) % 4294967296) AS h32
          FROM k
        )
        SELECT CAST((CASE WHEN h32 >= 2147483648
                          THEN abs(h32 - 4294967296) ELSE h32 END) % 8 AS BIGINT)
                 AS partition,
               count(*) AS n_keys
        FROM h
        GROUP BY 1
        ORDER BY partition
    """,
)
def kafka_partitioner_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Producer partitioner parity as a DRIVER gate (R11): the
    reference's default partitioner FNV-1a-hashes the record key and
    takes abs(int32) % numPartitions (siesta-producer/partitioner.go:
    15-44). 2000 synthesized ASCII keys route through OUR pure-Column
    fold (functions/hashes.fnv1a32_partition — exact uint32 wraparound,
    no UDF) while the oracle re-implements the same byte fold in DuckDB
    via list_reduce; the per-partition key histogram hash-matches only
    if every single key landed on the same partition in both engines —
    stronger than the golden-value unit tests because it covers the
    whole key population. At scale this expression IS the Kafka sink's
    partition router, evaluated inside codegen on the write path."""
    from syslog_kafka_spark.functions.hashes import fnv1a32_partition
    from syslog_kafka_spark.sources.readers import load_tables

    o = load_tables(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 2000)
    keys = o.select(
        F.concat(F.lit("key-"), F.col("o_orderkey").cast("string")).alias("key")
    )
    return (
        keys.select(fnv1a32_partition("key", 8).cast("bigint").alias("partition"))
        .groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("partition")
    )
