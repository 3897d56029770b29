"""Optimization measurement harness (rounds 13+).

Isolated per-key timing with the bench's exact protocol (1 warmup +
median of 3, timed action = df.count()) plus plan capture, so every
optimization carries before/after evidence without a 35-minute full
sweep. NOT a substitute for bench.py — the committed artifact only ever
refreshes through bench.py's guarded path.

Usage:
    python scripts/opt_measure.py name1 name2 ...         # time keys
    python scripts/opt_measure.py --plan name1 ...        # + save plans
    python scripts/opt_measure.py --plan-suffix after ... # plans/<round>/<n>_after.txt
    python scripts/opt_measure.py --top 30                # 30 most expensive
                                                          # keys per committed
                                                          # BENCH_FULL.json
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
SPARK_GRAFT_PLANS_ROUND (plans subdir, default r14).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_vector_database_spark import queries as _q
from distributed_vector_database_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_DIR = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
)


def committed_queries() -> dict[str, float]:
    out = subprocess.run(
        ["git", "show", "HEAD:BENCH_FULL.json"], cwd=REPO, capture_output=True
    )
    if out.returncode != 0:
        return {}
    return json.loads(out.stdout.decode()).get("queries", {})


def main() -> None:
    args = sys.argv[1:]
    save_plan = False
    plan_only = False
    suffix = "before"
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--plan":
            save_plan = True
        elif a == "--plan-only":
            save_plan = True
            plan_only = True
        elif a == "--plan-suffix":
            save_plan = True
            suffix = next(it)
        elif a == "--top":
            # truncate only the ranked extension, never explicitly
            # requested names (ADVICE r13)
            n = int(next(it))
            ranked = sorted(
                committed_queries().items(), key=lambda kv: -kv[1]
            )
            reg = set(_q.spark_queries())
            names.extend(
                [k for k, _ in ranked if k in reg and k not in names][:n]
            )
        else:
            names.append(a)
    if not names:
        print("no names given", file=sys.stderr)
        raise SystemExit(2)

    spark = get_session(app_name="opt-measure")
    fns = _q.spark_queries()
    committed = committed_queries()
    os.makedirs(PLANS_DIR, exist_ok=True)
    results = {}
    for name in names:
        fn = fns.get(name)
        if fn is None:
            print(f"{name}: SKIP (not a registry key)", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"opt:{name}")
        try:
            if save_plan:
                from distributed_vector_database_spark.plans.inspect import (
                    plan_text,
                )

                txt = plan_text(fn(spark, SF_DIR))
                with open(
                    os.path.join(PLANS_DIR, f"{name}_{suffix}.txt"), "w"
                ) as f:
                    f.write(txt)
            if plan_only:
                print(f"{name}: plan saved", flush=True)
                continue
            fn(spark, SF_DIR).count()  # warmup
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                times.append(time.perf_counter() - t0)
            med = statistics.median(times)
            results[name] = round(med, 4)
            ref = committed.get(name)
            rel = f" ({med / ref:.2f}x committed {ref})" if ref else ""
            print(f"{name}: {med:.4f}s  runs={[round(t,3) for t in times]}{rel}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {e}", flush=True)
            results[name] = -1.0
        finally:
            spark.sparkContext.setJobDescription(None)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
