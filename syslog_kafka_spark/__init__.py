"""syslog_kafka_spark — a PySpark-native log-analytics engine.

A from-scratch rebuild of the *capabilities* of elodina/syslog-kafka
(reference: /root/reference, Go) on Apache Spark:

- syslog ingestion (TCP/UDP streaming source, RFC3164/RFC5424 parsing)
- LogLine data model (Avro / Protobuf / string wire encodings, Confluent
  Schema Registry framing) and Kafka sink projections
- a full relational analytics surface over the ingested data model
  (DataFrame/SQL: joins, aggregation, windows, set ops, scalar functions)
- LLM-data-pipeline operators: dedup (exact/MinHash/SimHash/Jaccard),
  embedding similarity search, text analysis, multimodal column plumbing

Architecture is Spark-first: logical plans are declared with the
DataFrame/SQL API and optimized by Catalyst; Python UDFs appear only where
built-ins cannot express the semantics (wire encodings, multimodal decode),
and then always as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from syslog_kafka_spark.session import get_spark  # noqa: F401
