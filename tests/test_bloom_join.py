"""Runtime bloom-filter join (runtime_bloom_join): the big side's scan
must carry a might_contain(bloom) predicate built from the selective
side at runtime, and the conf flip must not leak."""

from distributed_vector_database_spark.queries import (
    _BLOOM_CONFS,
    _bloom_joined,
    registry,
)
from tests.conftest import SF_SMOKE


def test_plan_injects_bloom_filter(spark):
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        spark.conf.set(_BLOOM_CONFS[0], "true")
        spark.conf.set(_BLOOM_CONFS[1], "0")
        spark.conf.set(_BLOOM_CONFS[2], "-1")
        df = _bloom_joined(spark, SF_SMOKE)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "might_contain" in plan, plan
    assert "bloom_filter_agg" in plan


def test_result_matches_plain_join_and_confs_restored(spark):
    before = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    fn, _sql = registry()["runtime_bloom_join"]
    got = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    after = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    assert before == after
    exp = sorted(map(tuple, _bloom_joined(spark, SF_SMOKE).collect()))
    assert got == exp
