"""The correctness gate, run locally: every registered query's Spark result
must match its DuckDB oracle at sf0.01 — same comparison shape as the driver
(row count + column names + order-insensitive values)."""

import pytest

from distributed_vector_database_spark.queries import registry
from tests.conftest import SF_ORACLE, assert_df_matches_oracle

_REG = registry()


@pytest.mark.parametrize("name", sorted(_REG))
def test_query_matches_oracle(spark, duck, name):
    fn, sql = _REG[name]
    df = fn(spark, SF_ORACLE)
    if sql is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    assert_df_matches_oracle(df, duck, sql)
