from syslog_kafka_spark.plans.registry import QUERIES, QuerySpec, query  # noqa: F401
