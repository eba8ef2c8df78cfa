"""Every registered SQL-expressible query must match its DuckDB oracle
at sf0.001 (the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from prod_recommendation_pyspark_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, duck, ORACLES[name])


def test_all_queries_runnable(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
