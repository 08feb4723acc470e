"""Oracle suite: every gated query in the inventory vs DuckDB at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01); a pass here is a
strong predictor of a pass there. Queries without an oracle get a weaker
rows-and-schema smoke check.
"""

from __future__ import annotations

import pytest

from syslog_kafka_spark.plans.registry import load_all
from tests.conftest import assert_matches_oracle

ALL = load_all()


@pytest.mark.parametrize("name", sorted(ALL), ids=sorted(ALL))
def test_query(name, spark, duck, sf_dir):
    spec = ALL[name]
    df = spec.build(spark, sf_dir)
    if spec.oracle is not None:
        assert_matches_oracle(df, duck, spec.oracle, name=name)
    else:
        rows = df.collect()
        assert rows is not None
        assert len(df.columns) > 0
