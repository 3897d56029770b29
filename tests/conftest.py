import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_vector_database_spark.session import get_session

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="dvdb-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    return con


def assert_df_matches_oracle(spark_df, duck_con, sql, check_order=False):
    """Mini-oracle: same comparison shape as the driver — row count, column
    names, and order-insensitive values."""
    import math

    got = [tuple(r) for r in spark_df.collect()]
    exp_rel = duck_con.sql(sql)
    exp = [tuple(r) for r in exp_rel.fetchall()]
    assert [c.lower() for c in spark_df.columns] == [
        c.lower() for c in exp_rel.columns
    ], f"columns differ: {spark_df.columns} vs {exp_rel.columns}"
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"

    def norm(row):
        out = []
        for v in row:
            if isinstance(v, float):
                out.append(round(v, 6) + 0.0)  # -0.0 -> 0.0
            elif isinstance(v, list):
                out.append(tuple(v))
            else:
                out.append(v)
        return tuple(out)

    got_n = [norm(r) for r in got]
    exp_n = [norm(r) for r in exp]
    if not check_order:
        got_n = sorted(got_n, key=repr)
        exp_n = sorted(exp_n, key=repr)
    for i, (g, e) in enumerate(zip(got_n, exp_n)):
        assert g == e, f"row {i} differs:\n  spark: {g}\n  duck : {e}"
