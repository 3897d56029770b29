"""Fresh-process rehearsal of the driver's 50-query correctness window.

Mimics the round driver: one process, one Spark session, each window query
run at sf0.01 and compared to its DuckDB oracle with the same shape the
driver uses (row count + column names + order-insensitive dtype-tagged
values — via tests.conftest.assert_df_matches_oracle).

Usage:
    python scripts/rehearse_window.py            # the 50-slot window
    python scripts/rehearse_window.py --all      # every registered query
    python scripts/rehearse_window.py name1 ...  # specific names
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_vector_database_spark import queries as q
from distributed_vector_database_spark.session import get_session


def main() -> int:
    import duckdb

    from tests.conftest import SF_ORACLE, assert_df_matches_oracle

    args = sys.argv[1:]
    reg = q.registry()
    if args == ["--all"]:
        names = list(reg)
    elif args:
        names = args
    else:
        names = q._CHECK_FIRST

    spark = get_session(
        app_name="rehearse-window",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    duck = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")

    ok, bad = 0, []
    for i, name in enumerate(names, 1):
        fn, sql = reg[name]
        t0 = time.time()
        try:
            df = fn(spark, SF_ORACLE)
            if sql is None:
                assert df.count() >= 0
            else:
                assert_df_matches_oracle(df, duck, sql)
            ok += 1
            print(f"[{i}/{len(names)}] MATCH {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report every failure
            bad.append(name)
            print(f"[{i}/{len(names)}] FAIL  {name}: {e}", flush=True)
            traceback.print_exc()
    print(f"\n{ok}/{len(names)} MATCH; failures: {bad or 'none'}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
