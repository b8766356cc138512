"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
the same check the driver's CORRECTNESS gate runs."""

from __future__ import annotations

import pytest

from traffic_data_pipeline_spark.plans.queries import ORACLES, QUERIES
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir_oracle, name):
    df = QUERIES[name](spark, sf_dir_oracle)
    assert_matches_oracle(df, ORACLES[name], sf_dir_oracle)


def test_all_queries_run_smoke(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
