"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (fast local gate; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from cses2humio_spark.queries import ORACLES, QUERIES
from cses2humio_spark.queries.compare import compare_query
from tests.conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    res = compare_query(spark, SF_SMALL, QUERIES[name], ORACLES.get(name))
    assert res["ok"], f"{name}: {res['status']}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_query_has_oracle_or_is_flagged():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # non-SQL-expressible ops are allowed to be oracle-free, but keep the
    # list explicit so additions are deliberate
    allowed_rows_only = {
        "streaming_pipeline_demo",  # streaming mechanics, not SQL-expressible
        "approx_distinct_users",  # HLL/KLL sketches are engine-specific
    }
    assert set(missing) <= allowed_rows_only, f"queries without oracle: {missing}"
