"""Registry-wide physical-plan audit.

Every registered driver-contract query is built (not executed) at the
smoke scale and its physical plan checked for scale-killers: a
non-broadcast ``CartesianProduct`` is never acceptable (a broadcast
nested-loop join IS — that is how single-query vectors and tiny probe
tables enter plans). Streaming-replay queries are excluded: building them
runs the stream to completion, and their operators are plan-audited in
their own tests.
"""

import pytest

from distributed_vector_database_spark.plans.inspect import plan_text
from distributed_vector_database_spark.queries import registry
from tests.conftest import SF_SMOKE

# these EXECUTE a stream (or rewrite input files) when the query fn is
# called, so "build the plan" is not cheap for them; covered elsewhere
_EXECUTES_ON_BUILD = {
    "stream_dedup_counts",
    "stream_tumbling_counts",
    "stream_click_purchase_join",
    "stateful_running_totals",
    "stream_minhash_dedup_flags",
    "stream_sliding_counts",
    "stream_bigram_lm_counts",
    "sqlite_store_stream_ingest",
}

_REG = registry()


@pytest.mark.parametrize(
    "name", sorted(n for n in _REG if n not in _EXECUTES_ON_BUILD)
)
def test_no_cartesian_product(spark, name):
    fn, _sql = _REG[name]
    df = fn(spark, SF_SMOKE)
    assert "CartesianProduct" not in plan_text(df), (
        f"{name}: non-broadcast cartesian product in physical plan"
    )
