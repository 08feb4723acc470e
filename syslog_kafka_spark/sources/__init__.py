from syslog_kafka_spark.sources.readers import Tables, load_tables  # noqa: F401
