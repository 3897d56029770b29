"""Quick host-state probe before a full bench sweep.

Runs a handful of short, stable registry keys (1 warm-up + median of 3,
isolated) and prints their ratio to the committed BENCH_FULL.json — a
~90-second estimate of the fleet drift a full 35-minute sweep would
measure. Fire the real sweep only when the canary reads at or below the
guard's soft ceiling; otherwise wait for a quieter host window.

Why it exists (round 11, measured): three verified-idle sweeps in one
afternoon read fleet drift 1.168 / 1.169 / 1.200 against the round-9
reference and were all refused by bench.py's contention guard — about
1.8 h of sweep time that a 90-second canary would have predicted.

Besides printing GO/WAIT, the probe records its reading to
`.host_canary.json` ({ts, drift, loadavg1, verdict}) — bench.py's
`_drift_confirmed` requires this out-of-band corroboration before
accepting an in-band (MAX_DRIFT, HARD_DRIFT] fleet drift as host state
(ADVICE r11: same-run isolated re-measures cannot tell a run-long
background load from durable host state; a fresh idle-host canary that
already read elevated can). The 1-minute loadavg is sampled BEFORE the
Spark session starts, so it describes the idle host, not the probe.

Usage: python scripts/host_canary.py
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    CANARY_FILE,
    MAX_DRIFT,
    SF_DIR,
    _committed_bench,
    _reference_queries,
)
from distributed_vector_database_spark import queries as q  # noqa: E402
from distributed_vector_database_spark.session import get_session  # noqa: E402

# short keys with low variance and no heavyweight memoized build steps
CANARY_KEYS = [
    "point_lookup",
    "lineitem_pricing_summary",
    "topk_cosine",
    "event_type_rollup",
    "dedup_exact",
    "moving_avg_value",
    "term_frequencies",
]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    committed = _reference_queries(_committed_bench(repo), sf_val)
    if not committed:
        print("no committed BENCH_FULL reference — nothing to compare")
        return 2
    # idle-host load BEFORE the probe's own Spark session exists — the
    # corroboration signal that the elevated reading (if any) was not a
    # competing process
    loadavg1 = os.getloadavg()[0]
    spark = get_session(app_name="host-canary")
    reg = q.spark_queries()
    # session-level warm-up: the committed sweep values come from a HOT
    # JVM mid-sweep, so a fresh session's first jobs read 1.5-2.5x high
    # on pure JIT/classloading — two full passes over the canary set
    # before any timing (measured: without this the canary's first key
    # read 2.56x on a host whose true drift was ~1.2x)
    for _ in range(2):
        for name in CANARY_KEYS:
            if name in reg:
                reg[name](spark, SF_DIR).count()
    ratios = []
    for name in CANARY_KEYS:
        if name not in committed or name not in reg:
            continue
        fn = reg[name]
        fn(spark, SF_DIR).count()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        med = statistics.median(runs)
        r = med / committed[name]
        ratios.append(r)
        print(f"{name}: {med:.3f}s vs committed {committed[name]}s = {r:.3f}x")
    if not ratios:
        print("no comparable canary keys")
        return 2
    est = statistics.median(ratios)
    verdict = "GO" if est <= MAX_DRIFT else "WAIT"
    with open(os.path.join(repo, CANARY_FILE), "w") as fh:
        json.dump(
            {
                "ts": time.time(),
                "drift": round(est, 4),
                "loadavg1": round(loadavg1, 3),
                "verdict": verdict,
            },
            fh,
        )
    print(f"\nestimated fleet drift: {est:.3f}x "
          f"({'GO — fire the sweep' if verdict == 'GO' else 'WAIT — host above the guard soft ceiling'})"
          f" [recorded to {CANARY_FILE}, idle loadavg1={loadavg1:.2f}]")
    return 0 if verdict == "GO" else 1


if __name__ == "__main__":
    sys.exit(main())
