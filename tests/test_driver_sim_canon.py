"""Pin scripts/driver_sim.py's pandas canonicalizer to the real driver's
failure classes (round-4 postmortem: the old fetchall()+repr sim said
ALL PASS while the driver recorded 1 ERR + 2 hash FAILs).

Three behaviors must hold forever:
1. list/array result columns make canonicalization RAISE (the driver's
   pandas sort_values path throws TypeError: unhashable type) — the
   kafka_decode_roundtrip r4 ERR class;
2. DuckDB integer sum() (HUGEINT -> pandas float64) hash-MISMATCHES a
   Spark BIGINT even when values are numerically equal ("302.0" vs
   "302") — the agg_integrity_audit / scalar_collation_caseless class;
3. the documented fix shapes (CAST AS BIGINT, array_join-flattened
   collections) hash-MATCH.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from scripts.driver_sim import canon_pandas, render_value


def _duck_df(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def test_list_column_raises_like_the_driver():
    df = _duck_df("SELECT 1 AS id, [1, 2] AS arr")
    with pytest.raises(TypeError):
        canon_pandas(df)


def test_hugeint_sum_mismatches_bigint():
    # DuckDB sum() over integers -> HUGEINT -> pandas float64 (302.0);
    # an int64 column of the same value must NOT hash-match.
    oracle = _duck_df("SELECT sum(x) AS n FROM (VALUES (300), (2)) t(x)")
    spark_like = _duck_df("SELECT CAST(302 AS BIGINT) AS n")
    assert oracle["n"].dtype == "float64"  # the drift exists
    assert canon_pandas(oracle)[2] != canon_pandas(spark_like)[2]


def test_bigint_cast_fixes_the_mismatch():
    oracle = _duck_df("SELECT CAST(sum(x) AS BIGINT) AS n FROM (VALUES (300), (2)) t(x)")
    spark_like = _duck_df("SELECT CAST(302 AS BIGINT) AS n")
    assert canon_pandas(oracle) == canon_pandas(spark_like)


def test_flattened_collections_match():
    a = _duck_df("SELECT 'received' AS ev, '1|2' AS tv")
    b = _duck_df("SELECT array_to_string(['received'], '|') AS ev, "
                 "array_to_string([1, 2], '|') AS tv")
    assert canon_pandas(a) == canon_pandas(b)


def test_render_value_is_dtype_sensitive():
    import numpy as np

    assert render_value(np.int64(302)) == "302"
    assert render_value(np.float64(302.0)) == "302.0"
    assert render_value(np.int64(302)) != render_value(np.float64(302.0))
    assert render_value(float("nan")) == "NaN"
    assert render_value(None) == "None"


def test_date_equals_midnight_timestamp():
    # Calibrated against real driver stamps (r4): Spark DATE (object
    # dtype of datetime.date) vs DuckDB datetime64 midnight hash-MATCH.
    import datetime as dt

    spark_like = pd.DataFrame({"d": [dt.date(2020, 1, 2)]})
    duck_like = _duck_df("SELECT DATE '2020-01-02' AS d")
    assert duck_like["d"].dtype == "datetime64[us]"  # the drift exists
    assert canon_pandas(spark_like) == canon_pandas(duck_like)


def test_row_order_insensitive():
    a = _duck_df("SELECT * FROM (VALUES (1, 'b'), (2, 'a')) t(x, y)")
    b = _duck_df("SELECT * FROM (VALUES (2, 'a'), (1, 'b')) t(x, y)")
    assert canon_pandas(a) == canon_pandas(b)


def test_pytest_harness_rejects_hugeint_oracle(spark, duck):
    """The pytest oracle harness routes through the SAME pandas-path
    canonicalizer as the driver sim (tests/conftest imports
    scripts.driver_sim.canon_rows), so a deliberately-injected HUGEINT
    oracle — DuckDB sum() over integers → pandas float64 '15.0' against
    Spark's int64 '15' — must FAIL pytest locally, not only at the
    graded gate."""
    from tests.conftest import assert_matches_oracle

    sdf = spark.createDataFrame([(15,)], "s BIGINT")
    with pytest.raises(AssertionError):
        assert_matches_oracle(
            sdf, duck, "SELECT sum(x) AS s FROM range(1, 6) t(x)", name="hugeint_probe"
        )
    # and the BIGINT-cast house convention passes through the same path
    assert_matches_oracle(
        sdf,
        duck,
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM range(1, 6) t(x)",
        name="bigint_probe",
    )
