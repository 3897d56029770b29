"""Benchmark harness — prints ONE JSON line for the round driver.

Protocol mirrors the reference's (BASELINE.md): warm-up runs discarded, mean
of timed runs. Two layers:

  1. every registered driver-contract query, timed at $SPARK_GRAFT_SF_DIR
     (default /root/testdata/sf0.1) — the per-query seconds dict;
  2. a headline search-latency metric comparable to BASELINE.md: IVF
     top-5 cosine search over the embeddings corpus (nprobe=1 of 8 shards
     via injected centroids), single query, mean over N timed runs after
     warm-ups. The reference's comparable config (10k vectors, nprobe=1)
     costs 21-27 s/query; one Spark job over the same scale is ~0.1-1 s.

Usage: python bench.py   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

POLICY (the r6/r7 lesson, institutionalized): the COMMITTED BENCH_FULL.json
must only ever be refreshed from a quiet machine. A run whose artifact
defense adjudicates an unusually large slice of keys (see
`_contention_guard`) was itself contended — its numbers, even the isolated
re-measures, are suspect; the run prints a loud warning and stamps
`contention_warning` into the artifact so it is never silently committed
as the new reference. Refined in round 10 (measured reason, see
`_fleet_drift`): the slow-count band is centered on the run's median
host-state drift vs committed, with an absolute drift ceiling —
a best-ever committed baseline no longer makes every honest refresh on a
verified-idle host read as 'contended', while uniformly-slow contended
runs (the r6 signature) still refuse via the ceiling. Tightened in round
11 (ADVICE r10): the ceiling dropped 1.30 -> 1.15 (just above the
1.05-1.08x measured honest idle drift) and a p90/median ratio-tail check
(`_ratio_tail`, ceiling 1.30) closes the laundering window where a
moderate-median contended run hid per-key slowdowns up to ~1.63x inside
the drift-normalized slow band. Two round-11 additions from the same
day's measurements, both refined by ADVICE r11: (1) drift in
(MAX_DRIFT, HARD_DRIFT] is accepted ONLY with isolation confirmation
(`_drift_confirmed` — deviants re-run alone still read ~drift-slower,
i.e. reproducible host state vs a best-ever-host baseline, the ratchet
case; contention reverts on isolation) PLUS an out-of-band pre-sweep
corroboration (`_canary_corroborates` — the host_canary probe, taken
fresh on an idle host, already read elevated; same-run isolated
re-measures alone cannot tell a run-long background load from host
state), stamping a `drift_note` rebase record into the artifact;
(2) adjudicated keys publish the ISOLATED median (1 warmup + median of
3, the protocol every committed number uses), falling back to the sweep
value only when the isolated read > ISO_POLLUTION_RATIO x its own sweep
— the documented JVM-pollution case (measured 0.60 s sweep vs 3.94 s
isolated on an idle host). min(sweep, isolated) was abandoned: it
selected the lower noise tail on every adjudication, ratcheting the
reference faster each refresh — the exact unreachable-baseline failure
`_drift_confirmed` exists to work around.

Round 13 (VERDICT r12 item 1): BASELINE EPOCHS. When the host's durable
state sits above HARD_DRIFT relative to the committed reference (the r12
wedge: eight idle canary probes 1.42-1.97x across a whole session), no
honest sweep can ever publish and regression detection is dead. The
explicit exit is `python bench.py --rebase-epoch` (or env
SPARK_GRAFT_BENCH_REBASE_EPOCH=1): the superseded reference is archived
as BENCH_FULL.epoch{N}.json, the new artifact is stamped epoch N+1 with
full provenance (pre-sweep canary, drift vs the old epoch, isolation
sample, loadavg), and every guard ceiling stays unchanged WITHIN the new
epoch. `_epoch_rebase_verdict` accepts only the full wedge state —
drift > HARD_DRIFT, a wedge-grade pre-sweep idle canary, quiet relative
signatures, isolation agreement — so an epoch change can never launder
an ordinary contended run.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_vector_database_spark.session import get_session
from distributed_vector_database_spark import queries as _q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUPS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "1"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# Guard ceilings — single source of truth (ADVICE r11: these lived as
# per-function defaults plus a hardcoded literal in main() and another in
# scripts/host_canary.py; changing one silently desynchronized the rest).
MAX_DRIFT = 1.15   # soft fleet-drift ceiling: honest idle drift is 1.05-1.08x
HARD_DRIFT = 1.25  # absolute ceiling: never publishable, however reproducible
MAX_TAIL = 1.30    # p90/median deviation-tail ceiling (honest: 1.15-1.18)
# Isolated re-measures reading more than this multiple of their own sweep
# value are the documented JVM-pollution case (accumulated cache/GC state
# after 270+ queries: cdc_chunk_dedup_stats sweep 0.60 s vs isolated
# 3.94 s on an idle host) — only then does the sweep value get published.
ISO_POLLUTION_RATIO = 2.0
# Out-of-band canary corroboration for the (MAX_DRIFT, HARD_DRIFT] rebase
# band (ADVICE r11): the pre-sweep host_canary reading, recorded to
# CANARY_FILE by scripts/host_canary.py.
CANARY_FILE = ".host_canary.json"
CANARY_MAX_AGE_SEC = 6 * 3600  # a sweep is 33-70 min; probe must predate it
CANARY_IDLE_LOAD = 4.0         # 1-min loadavg ceiling on the idle pre-sweep host
CANARY_AGREE_TOL = 0.05        # canary drift must reach MAX_DRIFT - this


def _run(df) -> int:
    """Force full execution without driver-side materialization cost."""
    return df.count()


def time_query(fn, spark, warmups=WARMUPS, runs=RUNS) -> float:
    """Median of the kept runs, NOT mean: the registry sweep runs 200+
    keys back-to-back, and a single host-contended run skews a mean by
    2-5x (r4 published six >=2x "regressions" on byte-identical code —
    all run-adjacency artifacts). The median of 3 discards one outlier
    run entirely (VERDICT r4 item 3a)."""
    for _ in range(warmups):
        _run(fn(spark))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _run(fn(spark))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def _committed_bench(repo_dir: str) -> dict:
    """The last COMMITTED artifact (`git show HEAD:BENCH_FULL.json`) — the
    adjudicated quiet-machine reference the new sweep is defended against.
    Falls back to {} when absent (first run) or git is unavailable."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_FULL.json"],
            cwd=repo_dir,
            capture_output=True,
            timeout=30,
        )
        if out.returncode != 0:
            return {}
        return json.loads(out.stdout.decode())
    except Exception:
        return {}


def _reference_queries(committed_full: dict, sf_val) -> dict[str, float]:
    """The committed per-query dict usable as the deviation reference —
    empty when the committed artifact was measured at a DIFFERENT scale
    factor (cross-SF comparison would flag every key and re-measure the
    whole sweep)."""
    if committed_full.get("sf") != sf_val:
        return {}
    return committed_full.get("queries", {})


def _deviant_keys(
    measured: dict[str, float],
    committed: dict[str, float],
    *,
    ratio: float = 1.25,
) -> list[str]:
    """Keys whose sweep value moved >ratio in EITHER direction vs the
    committed artifact — candidates for isolated re-measurement. Keys
    absent from the committed file (new this round) or failed (<= 0 on
    either side) are skipped.

    ratio=1.25 (was 1.5 through round 7): VERDICT r7 found 13 keys riding
    through at 1.3-1.48x on code untouched all round — pure host
    contention passing under the old bar, silently accumulating in the
    published artifact round over round. 1.25 puts those inside the
    defense; the extra isolated re-measures cost ~1-3 min on a typical
    sweep (VERDICT r7 item 4)."""
    out = []
    for k, v in measured.items():
        ref = committed.get(k)
        if ref is None or ref <= 0 or v <= 0:
            continue
        if v > ref * ratio or v < ref / ratio:
            out.append(k)
    return out


def _defense_plan(
    deviants: list[str],
    registry_keys: set[str],
    key_to_group: dict[str, str],
) -> tuple[list[str], list[str]]:
    """Route contested keys to their isolated re-measure path: registry
    keys re-run one at a time; bench-internal one-shot cells re-run via
    their owning harness group (each group at most once, however many of
    its cells deviated). The two routes are DISJOINT: a key on the
    per-key path is excluded from the group set, else the later group
    re-run would overwrite its isolated number and record the isolated
    value in the adjudication 'sweep' field (ADVICE r7). A deviant key in
    neither set (shouldn't happen — every published key is one or the
    other) is silently left at its sweep value, which the adjudication
    table's absence makes visible."""
    per_key = [k for k in deviants if k in registry_keys]
    per_key_set = set(per_key)
    groups = sorted(
        {
            key_to_group[k]
            for k in deviants
            if k in key_to_group and k not in per_key_set
        }
    )
    return per_key, groups


def _fleet_drift(
    measured: dict[str, float], committed: dict[str, float]
) -> float:
    """Median measured/committed ratio over the keys both runs hold —
    the HOST-STATE drift of this run relative to the committed
    reference. Computed on raw sweep values BEFORE any isolated
    re-measures replace them. 1.0 when there is nothing to compare.

    Why it exists (round 10, measured): the committed r9 artifact was a
    best-ever 03:24 host state; three subsequent sweeps on verified-idle
    machines (no processes, <1% CPU steal) read a UNIFORM 5-10% slower
    fleet-wide (median ratios 1.05-1.08, p90 ~1.24) and each tripped the
    raw 1.25x slow-count — the guard was detecting an unreproducible
    baseline, not contention. Genuine contention (the r6 incident the
    guard was built for) looks different: unrelated keys 1.5-5x slow,
    i.e. a LARGE median shift and/or a wide deviation tail. So the
    slow-count band is now centered on this drift, and the drift itself
    gets an absolute ceiling (`_contention_guard(max_drift=...)`) so a
    uniformly-contended run can never launder itself as 'drift'."""
    ratios = sorted(
        v / committed[k]
        for k, v in measured.items()
        if committed.get(k, 0) > 0 and v > 0
    )
    return ratios[len(ratios) // 2] if ratios else 1.0


def _contention_guard(
    n_slow_adjudicated: int,
    n_keys: int,
    *,
    frac: float = 0.10,
    floor: int = 15,
    drift: float = 1.0,
    max_drift: float = MAX_DRIFT,
    tail: float = 1.0,
    max_tail: float = MAX_TAIL,
    confirmed: bool = False,
    hard_drift: float = HARD_DRIFT,
) -> bool:
    """True when the RUN ITSELF was contended (module-docstring policy)
    and its artifact must not become the committed reference. Three
    signatures, any one fires:

    1. drift above the ceiling — the whole fleet read slower than the
       committed reference (the r6 incident: unrelated keys uniformly
       1.5-5x slow). max_drift=1.15 (ADVICE r10): honest idle drift
       measured 1.05-1.08x across three r9/r10 verified-idle sweeps; the
       old 1.30 ceiling combined with the drift-normalized slow band
       opened a laundering window where a 1.28x-drift run masked per-key
       slowdowns up to ~1.63x. Between max_drift and hard_drift=1.25 the
       refusal is waived ONLY with isolation confirmation
       (`_drift_confirmed`: the deviants still read ~drift-slower when
       re-run alone — genuine host state, not contention, which reverts
       on isolation). Above hard_drift: always refuse.
    2. ``tail > max_tail`` — the p90/median of the raw sweep/committed
       ratio distribution (`_ratio_tail`): a moderate-median run whose
       slow TAIL is heavy is a partially-contended run even when
       signatures 1 and 3 stay quiet. Honest idle sweeps measure a
       tail of 1.15-1.18 (p90 ~1.24 over median ~1.06); genuine
       contention drags p90 to 1.5x+.
    3. more than max(floor, frac*n_keys) keys adjudicated slower than
       committed BEYOND the fleet drift (see `_slow_adjudicated`) — the
       bursty signature: a background load that hit a contiguous slice
       of the sweep. The r6 driver refresh had 31 such of 228.

    Only SLOW deviations count: faster-than-committed adjudications mean
    the COMMITTED reference was inflated and this quieter run is
    restoring truth (round-8 first run: 55 adjudicated, 42 FASTER).
    Centering the band on the measured drift (round 10) keeps an
    unreproducibly-fast committed baseline from making every honest
    refresh look contended — three r9/r10 sweeps on verified-idle hosts
    read a uniform ~1.08x and were refused by the raw count. Residual
    window after the r11 tightening: <=max(floor, frac*n) keys can still
    hide inside the 1.25*drift band (<=~1.44x at the ceiling) without
    moving p90 — two rounds' slow-count floor, not a fleet signature."""
    if drift > hard_drift:
        return True
    if drift > max_drift and not confirmed:
        return True
    if tail > max_tail:
        return True
    return n_slow_adjudicated > max(floor, int(frac * n_keys))


def _read_canary(repo_dir: str) -> dict | None:
    """The pre-sweep host-state probe `scripts/host_canary.py` records to
    CANARY_FILE ({ts, drift, loadavg1, verdict}). None when absent or
    unreadable."""
    try:
        with open(os.path.join(repo_dir, CANARY_FILE)) as fh:
            return json.load(fh)
    except Exception:
        return None


def _canary_corroborates(
    canary: dict | None,
    *,
    max_drift: float = MAX_DRIFT,
    sweep_start: float | None = None,
) -> bool:
    """Whether the out-of-band pre-sweep canary reading corroborates a
    host-state (not contention) explanation for an in-band fleet drift
    (ADVICE r11: same-run isolated re-measures alone cannot tell a
    background load sustained across the whole run from durable host
    state — both keep deviants slow in isolation). Three requirements:

    1. fresh AND pre-sweep — recorded within CANARY_MAX_AGE_SEC before
       the SWEEP'S START (ADVICE r12: measuring freshness at the
       end-of-sweep check let a canary written mid-sweep corroborate a
       rebase, voiding the "out-of-band, predates the run" contract;
       with no sweep_start the caller gets the conservative now-based
       window, which only ever shortens the accepted age);
    2. idle — the probe's 1-minute loadavg was at or below
       CANARY_IDLE_LOAD, so the elevated reading was measured with no
       competing process running: whatever slows the host is durable
       state (thermal/kernel/VM neighbor), not a load that would also
       pollute the sweep;
    3. elevated — the canary's own drift estimate already reached
       max_drift - CANARY_AGREE_TOL. A GO-grade canary followed by an
       in-band sweep drift means the slowdown ARRIVED DURING the run —
       the contention signature, never confirmable."""
    if not canary:
        return False
    try:
        ts = float(canary["ts"])
        cdrift = float(canary["drift"])
        load1 = float(canary["loadavg1"])
    except (KeyError, TypeError, ValueError):
        return False
    anchor = sweep_start if sweep_start is not None else time.time()
    if not (0 <= anchor - ts <= CANARY_MAX_AGE_SEC):
        return False
    if load1 > CANARY_IDLE_LOAD:
        return False
    return cdrift >= max_drift - CANARY_AGREE_TOL


def _drift_confirmed(
    drift: float,
    adjudicated: dict,
    *,
    canary: dict | None = None,
    max_drift: float = MAX_DRIFT,
    hard_drift: float = HARD_DRIFT,
    min_adjudicated: int = 20,
    sweep_start: float | None = None,
) -> bool:
    """Whether a fleet drift in (max_drift, hard_drift] is CONFIRMED as
    genuine host state rather than contention, neutralizing the absolute
    ceiling for this run (round 11, measured reason): two back-to-back
    verified-idle sweeps read drift 1.1676/1.1687 (agreement to 0.1%)
    against the round-9 reference — a committed baseline captured in a
    best-ever host state that four subsequent idle sweeps never
    reproduced. An absolute ceiling alone makes such a reference
    permanently unrefreshable (the ratchet problem); evidence that the
    drift is REAL is that deviant keys re-measured in ISOLATION still
    read ~drift-slower. Genuine contention looks the opposite — the r6
    incident's deviants reverted toward committed once re-run alone.

    Confirmation = BOTH of: (a) an out-of-band corroborating signal —
    the pre-sweep host_canary reading (`_canary_corroborates`: fresh,
    taken on an idle host, and itself already elevated) — because
    same-run isolated re-measures cannot distinguish a background load
    sustained across the whole run from durable host state (ADVICE r11);
    and (b) median isolated/committed over the adjudicated keys is at
    least (drift - 0.05): the deviants did not vanish on isolation.
    Requires >= min_adjudicated adjudications (no evidence, no
    confirmation) and never applies above hard_drift — a >25% slower
    baseline is not silently publishable no matter how reproducible.
    The tail and slow-count signatures still apply unchanged, so a
    moderate-median run with a contended slice refuses regardless."""
    if drift > hard_drift or len(adjudicated) < min_adjudicated:
        return False
    if not _canary_corroborates(
        canary, max_drift=max_drift, sweep_start=sweep_start
    ):
        return False
    iso_med, n_iso = _isolation_median(adjudicated)
    if n_iso < min_adjudicated or iso_med is None:
        return False
    return iso_med >= drift - 0.05


def _ratio_tail(
    measured: dict[str, float], committed: dict[str, float]
) -> float:
    """p90/median of the raw sweep/committed ratios over shared keys —
    the deviation-TAIL companion to `_fleet_drift` (ADVICE r10). A
    contended slice of the sweep inflates p90 while leaving the median
    (and thus the drift-normalized slow band) nearly untouched; this
    statistic catches that shape. Computed on raw sweep values BEFORE
    isolated re-measures replace them. 1.0 when there is nothing to
    compare."""
    ratios = sorted(
        v / committed[k]
        for k, v in measured.items()
        if committed.get(k, 0) > 0 and v > 0
    )
    if not ratios:
        return 1.0
    med = ratios[len(ratios) // 2]
    p90 = ratios[min(len(ratios) - 1, int(0.9 * len(ratios)))]
    # Median clamped at 1.0 (round 13, measured reason): on a host
    # FASTER than the committed reference (fleet median < 1.0 — first
    # seen 2026-08-17, sweeps at 0.963-0.984x), dividing by the sub-1.0
    # median inflates the tail: p90 1.2497 — an honest spread by the
    # very measurements that calibrated MAX_TAIL (honest p90 ~1.24) —
    # read as 1.3012 and refused. Contention can only ever make the
    # median SLOWER, never faster, so the clamp relaxes nothing a
    # contended run could exploit; for every drift >= 1.0 regime the
    # statistic is byte-identical to the r11 calibration.
    return p90 / max(med, 1.0)


def _publish_adjudicated(sweep: float, iso: float) -> tuple[float, str]:
    """The value (and an audit label for the adjudication table) an
    adjudicated key publishes. Isolated median by default — the same
    1-warmup+median-of-3 protocol every committed number uses; the sweep
    value only in the documented JVM-pollution case (isolated >
    ISO_POLLUTION_RATIO x its own sweep: accumulated cache/GC state after
    270+ queries — measured 0.60 s sweep vs 3.94 s isolated on an idle
    host). ADVICE r11: the previous min(sweep, isolated) selected the
    lower noise tail on every adjudication (42 of 87 keys in the
    committed artifact), ratcheting the reference faster each refresh —
    the exact unreachable-baseline failure `_drift_confirmed` exists to
    work around."""
    if iso > sweep * ISO_POLLUTION_RATIO:
        return sweep, "sweep (isolated JVM-polluted)"
    return iso, "isolated"


def _slow_adjudicated(
    adjudicated: dict, *, ratio: float = 1.25, drift: float = 1.0
) -> int:
    """Count adjudications whose SWEEP read slower than committed by
    more than the band — measured RELATIVE to the run's fleet drift
    (`_fleet_drift`), so a uniform host-state shift does not count
    every key as slow while key-specific (bursty) slowdowns still do.

    Drift clamped at 1.0 (round 13, same measured reason as
    `_ratio_tail`'s clamp): on a faster-than-baseline host (fleet
    median < 1.0) the drift-centered band TIGHTENS below the absolute
    1.25x the statistic was calibrated with, counting honestly-noisy
    keys as bursty. A contended run's median only ever moves UP, so the
    clamp cannot launder contention; for drift >= 1.0 the band is
    unchanged."""
    return sum(
        1
        for a in adjudicated.values()
        if a["sweep"] > a["committed"] * ratio * max(drift, 1.0)
    )


def _isolation_median(adjudicated: dict) -> tuple[float | None, int]:
    """(median isolated/committed ratio, count) over the adjudicated
    keys — the shared "deviants did not vanish on isolation" statistic
    used by both the (MAX_DRIFT, HARD_DRIFT] rebase band
    (`_drift_confirmed`) and the epoch-change gate
    (`_epoch_rebase_verdict`)."""
    ratios = sorted(
        a["isolated"] / a["committed"]
        for a in adjudicated.values()
        if a.get("committed", 0) > 0 and a.get("isolated", 0) > 0
    )
    if not ratios:
        return None, 0
    return ratios[len(ratios) // 2], len(ratios)


def _epoch_rebase_verdict(
    *,
    drift: float,
    tail: float,
    n_slow: int,
    n_keys: int,
    adjudicated: dict,
    canary: dict | None,
    sweep_start: float,
    min_adjudicated: int = 20,
) -> tuple[bool, str]:
    """Whether an EXPLICIT `--rebase-epoch` run may publish itself as the
    next baseline epoch (VERDICT r12 item 1: the principled exit from a
    wedged bench system — the committed reference was captured in a host
    state this machine can no longer reach, so every honest sweep reads
    above HARD_DRIFT forever and regression detection is dead). This is
    NOT a widened ceiling: every guard semantic stays unchanged WITHIN
    an epoch; an epoch change is a provenance-stamped, archived,
    explicitly-requested event that must satisfy ALL of:

    1. drift > HARD_DRIFT — otherwise the normal machinery (plain
       commit at <= MAX_DRIFT, or the isolation-confirmed rebase band
       up to HARD_DRIFT) applies and an epoch change is refused as
       unnecessary;
    2. the pre-sweep canary shows the WEDGE state: recorded before the
       sweep started (ADVICE r12 anchor), on an idle host
       (loadavg1 <= CANARY_IDLE_LOAD), itself reading >= HARD_DRIFT —
       out-of-band evidence the elevation is durable host state, not a
       load this run brought along;
    3. the run is internally quiet by the RELATIVE signatures: ratio
       tail <= MAX_TAIL and the drift-centered slow count inside the
       contention band — a bursty sweep cannot become a reference,
       epoch change or not;
    4. isolation agreement: >= min_adjudicated adjudications whose
       median isolated/committed is >= drift - 0.05 (the sweep's
       elevation reproduces key-by-key in isolation; contention
       reverts). The rebase sweep guarantees this sample exists by
       adjudicating a deterministic spread of in-band keys on top of
       the usual deviants.
    """
    if drift <= HARD_DRIFT:
        return False, (
            f"fleet drift {drift:.3f}x <= HARD_DRIFT {HARD_DRIFT}x: the "
            "normal guard machinery applies; an epoch change is not "
            "justified"
        )
    if not _canary_corroborates(
        canary,
        max_drift=HARD_DRIFT + CANARY_AGREE_TOL,
        sweep_start=sweep_start,
    ):
        return False, (
            "no wedge-grade pre-sweep canary: need a recording made "
            "BEFORE the sweep started, at idle loadavg1 <= "
            f"{CANARY_IDLE_LOAD}, reading >= {HARD_DRIFT}x"
        )
    if tail > MAX_TAIL:
        return False, (
            f"ratio tail {tail:.3f} > {MAX_TAIL}: partially-contended "
            "run; a rebase sweep must be internally quiet"
        )
    if n_slow > max(15, int(0.10 * n_keys)):
        return False, (
            f"{n_slow}/{n_keys} keys slow beyond the drift-centered "
            "band: bursty run; a rebase sweep must be internally quiet"
        )
    iso_med, n_iso = _isolation_median(adjudicated)
    if n_iso < min_adjudicated or iso_med is None:
        return False, (
            f"only {n_iso} adjudications (< {min_adjudicated}): not "
            "enough isolation evidence for an epoch change"
        )
    if iso_med < drift - 0.05:
        return False, (
            f"isolation median {iso_med:.3f}x < drift - 0.05 "
            f"({drift - 0.05:.3f}x): deviants revert when re-run alone "
            "— the contention signature, never an epoch change"
        )
    return True, (
        f"drift {drift:.3f}x above HARD_DRIFT with wedge-grade canary, "
        f"quiet relative signatures (tail {tail:.3f}, slow {n_slow}) and "
        f"isolation agreement ({iso_med:.3f}x over {n_iso} keys)"
    )


def _archive_epoch(repo_dir: str, committed_full: dict) -> str:
    """Preserve the superseded committed reference as
    BENCH_FULL.epoch{N}.json (committed alongside, never overwritten) so
    the old epoch's numbers stay inspectable after the rebase."""
    n = int(committed_full.get("epoch", 1))
    name = f"BENCH_FULL.epoch{n}.json"
    path = os.path.join(repo_dir, name)
    if not os.path.exists(path):
        with open(path, "w") as f:
            json.dump(committed_full, f, indent=1, sort_keys=True)
    return name


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # captured BEFORE any timing: the canary-corroboration contract is
    # "the probe predates this sweep" (ADVICE r12), so freshness is
    # measured against this instant, not the end-of-sweep check.
    sweep_start = time.time()
    spark = get_session(app_name="dvdb-bench")

    per_query: dict[str, float] = {}
    for name, fn in sorted(_q.spark_queries().items()):
        t0 = time.perf_counter()
        try:
            per_query[name] = round(
                time_query(lambda s, f=fn: f(s, SF_DIR), spark), 4
            )
        except Exception as e:  # a failing query must not kill the bench
            print(f"# bench query {name} failed: {e}", file=sys.stderr)
            per_query[name] = -1.0
        print(
            f"# bench {name}: {per_query[name]}s "
            f"(wall {time.perf_counter() - t0:.1f}s)",
            file=sys.stderr,
            flush=True,
        )

    # Bench-internal one-shot cells, organized as named GROUPS so the
    # artifact defense below can re-run an owning harness in isolation
    # when a cell deviates (VERDICT r6 item 2 — these were the only keys
    # a contended host could still move; the r6 driver refresh published
    # topk768_arrow/sq768_encode/pq768_encode 1.5-1.9x slow on unchanged
    # code because the old defense covered registry keys only).
    from distributed_vector_database_spark.benchmark import (
        batch_amortized_latency,
        high_dim_latency,
        high_dim_pq_latency,
        high_dim_sq8_latency,
        skew_join_compare,
    )
    from distributed_vector_database_spark.operators.ivf import (
        assign_shards,
        nearest_shards,
    )
    from distributed_vector_database_spark.operators.topk import topk
    from pyspark.sql import functions as F

    def grp_headline() -> dict[str, float]:
        # headline: search latency, BASELINE-comparable protocol; the
        # sharded layout is pre-materialized once (index build, not
        # query time)
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        cents = _q._fixed_centroids(spark, SF_DIR, n=8)
        qv = _q._query_vec(spark, SF_DIR, 0)
        indexed = assign_shards(emb, cents).cache()
        indexed.count()
        shards = nearest_shards(qv, cents, nprobe=1)

        def search(s):
            return topk(
                indexed.filter(F.col("shard_id").isin(shards)), qv, k=5
            )

        latency = time_query(search, spark, warmups=3, runs=11)
        indexed.unpersist()
        return {"ivf_search_nprobe1_cached": round(latency, 4)}

    def grp_highdim() -> dict[str, float]:
        # BASELINE-dimension parity: the reference's numbers are 768-d;
        # tile the 64-d testdata 12x and measure full-scan exact search
        # at equal compute. warmups=2/trials=7: this cell sits mid-run
        # and is the single most adjacency-noise-prone number (Arrow
        # transfer vs a stressed python worker pool; isolated A/B
        # measures 0.97-1.07 s where a 3-trial mid-bench median has read
        # 2.2 s) — more trials, median kept
        hd = high_dim_latency(spark, SF_DIR, warmups=2, trials=7)
        return {
            "topk768_expr": hd["expr_mean_sec"],
            "topk768_arrow": hd["arrow_mean_sec"],
        }

    def grp_pq() -> dict[str, float]:
        # compressed-domain counterpart at the same 10k x 768-d scale
        pqhd = high_dim_pq_latency(spark, SF_DIR)
        return {
            "topk768_pq_adc": pqhd["adc_gather_mean_sec"],
            "pq768_encode": pqhd["encode_sec"],
        }

    def grp_sq8() -> dict[str, float]:
        # SQ8 at the same scale: the near-lossless byte-domain point
        sqhd = high_dim_sq8_latency(spark, SF_DIR)
        return {
            "topk768_sq8_adc": sqhd["adc_mean_sec"],
            "sq768_encode": sqhd["encode_sec"],
        }

    def grp_batch() -> dict[str, float]:
        # batch-mode amortization: 100 queries in ONE job (BASELINE.md
        # notes this is the regime that beats every reference cell)
        ba = batch_amortized_latency(spark, SF_DIR)
        return {"batch100_sec_per_query": round(ba["sec_per_query"], 5)}

    def grp_skew() -> dict[str, float]:
        # skew story (ROADMAP #5): hot-key join, AQE vs no-AQE vs salted
        return {
            f"skewjoin_{name}": sec
            for name, sec in skew_join_compare(spark).items()
        }

    one_shot_groups = {
        "headline": grp_headline,
        "highdim": grp_highdim,
        "pq": grp_pq,
        "sq8": grp_sq8,
        "batch": grp_batch,
        "skew": grp_skew,
    }
    key_to_group: dict[str, str] = {}
    for gname, gfn in one_shot_groups.items():
        vals = gfn()
        per_query.update(vals)
        key_to_group.update({k: gname for k in vals})

    # Artifact defense (VERDICT r5 item 2, automating the manual
    # adjudication loop of ROADMAP.md "final BENCH_FULL refresh"): a
    # contended host — the driver's or the builder's — makes unrelated
    # keys read uniformly 1.5-5x slow and would publish false
    # regressions over byte-identical code (it happened in r4 and again
    # to the r5 driver refresh). Before writing BENCH_FULL, every key
    # that deviates >1.5x in either direction from the last COMMITTED
    # artifact is re-measured at the end of the run in isolation, and
    # the isolated number is what gets published: registry keys one at
    # a time (1 warmup + median of 3 — the isolated-median protocol),
    # bench-internal one-shot cells by re-running their owning harness
    # group once (VERDICT r6 item 2; each harness already carries its
    # own warmup+median protocol). The adjudication table rides along
    # in the artifact so a reader can see which keys were contested and
    # what the sweep had said.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    committed_full = _committed_bench(repo_dir)
    committed = _reference_queries(committed_full, sf_val)
    rebase_requested = (
        "--rebase-epoch" in sys.argv
        or os.environ.get("SPARK_GRAFT_BENCH_REBASE_EPOCH") == "1"
    )
    adjudicated: dict[str, dict[str, float]] = {}
    # host-state drift + deviation tail of the RAW sweep vs committed —
    # captured before the defense replaces deviant values with isolated
    # medians
    drift = _fleet_drift(per_query, committed)
    tail = _ratio_tail(per_query, committed)
    if committed and os.environ.get("SPARK_GRAFT_BENCH_DEFEND", "1") != "0":
        registry_fns = _q.spark_queries()
        if rebase_requested:
            # Epoch-rebase sweep: against an unreachable baseline MOST
            # keys exceed the raw 1.25x band, which would re-measure the
            # whole registry; center the deviant band on the fleet drift
            # (bursty outliers still adjudicate) and ADD a deterministic
            # spread of ~25 in-band keys so `_epoch_rebase_verdict` has
            # its isolation-agreement sample either way.
            shifted = {k: v * drift for k, v in committed.items()}
            deviants = set(_deviant_keys(per_query, shifted))
            shared = sorted(
                k
                for k, v in per_query.items()
                if committed.get(k, 0) > 0 and v > 0
            )
            step = max(1, len(shared) // 25)
            deviants |= set(shared[::step])
            deviants = sorted(deviants)
        else:
            deviants = _deviant_keys(per_query, committed)
        per_key_redo, regroup = _defense_plan(
            deviants, set(registry_fns), key_to_group
        )
        for key in per_key_redo:
            fn = registry_fns[key]
            try:
                time.sleep(1)  # let straggler tasks/GC settle
                iso = round(
                    time_query(
                        lambda s, f=fn: f(s, SF_DIR),
                        spark,
                        warmups=1,
                        runs=3,
                    ),
                    4,
                )
            except Exception as e:
                print(f"# defend {key} failed: {e}", file=sys.stderr)
                continue
            adjudicated[key] = {
                "sweep": per_query[key],
                "committed": committed[key],
                "isolated": iso,
            }
            print(
                f"# defend {key}: sweep={per_query[key]} "
                f"committed={committed[key]} isolated={iso}",
                file=sys.stderr,
                flush=True,
            )
            # both readings stay in the adjudication table; the
            # published value follows `_publish_adjudicated`
            per_query[key], adjudicated[key]["published"] = (
                _publish_adjudicated(per_query[key], iso)
            )
        for gname in regroup:
            try:
                time.sleep(1)
                fresh = one_shot_groups[gname]()
            except Exception as e:
                print(f"# defend group {gname} failed: {e}", file=sys.stderr)
                continue
            for key, iso in fresh.items():
                if key not in deviants or key in per_key_redo:
                    continue  # only contested cells not already
                    # adjudicated per-key get republished
                adjudicated[key] = {
                    "sweep": per_query[key],
                    "committed": committed[key],
                    "isolated": iso,
                }
                print(
                    f"# defend {key} (group {gname}): "
                    f"sweep={per_query[key]} committed={committed[key]} "
                    f"isolated={iso}",
                    file=sys.stderr,
                    flush=True,
                )
                per_query[key], adjudicated[key]["published"] = (
                    _publish_adjudicated(per_query[key], iso)
                )

    latency = per_query["ivf_search_nprobe1_cached"]

    # The driver tail-captures stdout, so the FINAL line must stay compact
    # (round 1's 98-query dict overflowed the capture -> "parsed": null).
    # Full per-query seconds go to a side file + stderr; the last stdout line
    # carries only the headline + BASELINE-comparable cells.
    full = {
        "metric": "ivf_search_latency_nprobe1",
        "value": round(latency, 4),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if committed:
        full["fleet_drift"] = round(drift, 4)
        full["ratio_tail"] = round(tail, 4)
        if adjudicated:
            full["adjudicated"] = adjudicated
        # The guard runs whenever a committed reference exists — a heavy
        # drift/tail must stamp the artifact even if the defense pass
        # produced no adjudications (ADVICE r10).
        n_slow = _slow_adjudicated(adjudicated, drift=drift)
        canary = _read_canary(repo_dir)
        confirmed = _drift_confirmed(
            drift, adjudicated, canary=canary, sweep_start=sweep_start
        )
        # baseline-epoch stamp rides along unchanged on every normal
        # refresh; an accepted --rebase-epoch run advances it below
        full["epoch"] = int(committed_full.get("epoch", 1))
        rebased = False
        if rebase_requested:
            ok, why = _epoch_rebase_verdict(
                drift=drift,
                tail=tail,
                n_slow=n_slow,
                n_keys=len(per_query),
                adjudicated=adjudicated,
                canary=canary,
                sweep_start=sweep_start,
            )
            if ok:
                archived = _archive_epoch(repo_dir, committed_full)
                full["epoch"] = int(committed_full.get("epoch", 1)) + 1
                full["epoch_provenance"] = {
                    "rebased_from": archived,
                    "prev_epoch": int(committed_full.get("epoch", 1)),
                    "drift_vs_prev_epoch": round(drift, 4),
                    "ratio_tail": round(tail, 4),
                    "slow_adjudicated": n_slow,
                    "adjudicated_count": len(adjudicated),
                    "isolation_median_ratio": round(
                        _isolation_median(adjudicated)[0] or 0.0, 4
                    ),
                    "canary": canary,
                    "sweep_start_unix": round(sweep_start, 1),
                    "loadavg_at_finish": [
                        round(x, 3) for x in os.getloadavg()
                    ],
                    "verdict": why,
                    "reason": (
                        "committed reference unreachable on this host's "
                        "durable state (wedge-grade canary at idle); "
                        "explicit provenance-stamped epoch change — all "
                        "guard ceilings unchanged within the new epoch"
                    ),
                }
                rebased = True
                print(
                    f"# EPOCH REBASE accepted -> epoch "
                    f"{full['epoch']}: {why}",
                    file=sys.stderr,
                    flush=True,
                )
            else:
                print(
                    f"# EPOCH REBASE refused: {why}",
                    file=sys.stderr,
                    flush=True,
                )
        if not rebased and _contention_guard(
            n_slow,
            len(per_query),
            drift=drift,
            tail=tail,
            confirmed=confirmed,
        ):
            full["contention_warning"] = (
                f"{n_slow}/{len(per_query)} keys adjudicated SLOWER than "
                f"committed beyond the {drift:.3f}x fleet drift (drift "
                f"ceiling {MAX_DRIFT}x soft / {HARD_DRIFT}x hard, "
                f"isolation+canary-confirmed={confirmed}, p90/median "
                f"tail {tail:.3f} ceiling {MAX_TAIL}x) — this RUN was "
                "contended; do NOT commit this artifact as the "
                "quiet-machine reference (bench.py module policy)"
            )
            print(
                f"# WARNING: {full['contention_warning']}",
                file=sys.stderr,
                flush=True,
            )
        elif drift > MAX_DRIFT and confirmed:
            full["drift_note"] = (
                f"fleet drift {drift:.3f}x vs the committed reference, "
                "accepted via isolation + pre-sweep-canary confirmation "
                "(_drift_confirmed): the deviant keys still read "
                "~drift-slower when re-run alone AND the out-of-band "
                f"canary (drift {canary.get('drift') if canary else '?'}x "
                f"at loadavg {canary.get('loadavg1') if canary else '?'}) "
                "already saw the elevated host before the sweep, so the "
                "drift is reproducible host state relative to a "
                "faster-host baseline, not contention. This artifact "
                "REBASES the reference to the current honest host state; "
                "a future sweep on a faster host will adjudicate keys "
                "FASTER, which the guard always allows."
            )
            print(
                f"# NOTE: {full['drift_note']}", file=sys.stderr, flush=True
            )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_FULL.json"),
        "w",
    ) as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(json.dumps(full), file=sys.stderr)

    # Expected ranges at sf0.1 / local[32] (VERDICT r4 item 8): keys with
    # an irreducible multi-round shuffle floor, so a genuine regression is
    # distinguishable from their baseline cost. Measured clean-machine
    # medians; >=1.5x above the high end on a quiet host is a real
    # regression, inside the band is noise.
    #   supplier_customer_pagerank  ~3.5-4.5 s  (per-iteration shuffle floor,
    #                               loop-invariant frames checkpointed)
    #   dedup_clusters              ~3.0-4.0 s  (prefix-Jaccard pairs +
    #                               iterative connected components)
    #   dedup_keep_best             ~3.0-4.0 s  (same CC core + argmax window)
    #   dedup_simhash_pairs         ~1.5-4.5 s  (64-bit fingerprint agg +
    #                               4-bit-band self-join; adjacency-noise
    #                               prone: isolated 1.7 s, mid-sweep 4.5 s)
    #   stateful_running_totals     ~3.0-4.0 s  (applyInPandasWithState
    #                               micro-batch harness cost, not the op)
    #   sq8_rerank_topk             ~1.4-2.1 s  (two-stage: ADC scan +
    #                               exact re-rank join; isolated median
    #                               1.76 s, r5 full-run spread 1.68/2.05)
    #   sql_topk_cosine             ~0.6-1.0 s  (SQL-path brute-force scan)
    #   topk768_pq_adc              ~0.45-0.90 s (gather-ADC Arrow path;
    #                               the r5 two-run diff's only >1.5x key —
    #                               python-worker-pool adjacency noise)
    #   embedding_drift             ~0.3-0.7 s  (tiny two-agg broadcast
    #                               join; fixed-overhead-bound, so +-0.2 s
    #                               scheduling noise is a large ratio)
    #   knn_graph_lsh               ~2.0-3.0 s  (bucket self-join + rank
    #                               window; isolated median 2.4 s)
    #   knn_triangle_stats          ~1.4-2.6 s  (exact graph + census;
    #                               isolated median 1.4 s, mid-sweep 2.6 s)
    #   knn_graph_lsh_capped        ~3.0-4.2 s  (adds the count/choice agg,
    #                               salt-cell window and Arrow GEMM stage;
    #                               isolated median 3.5 s)
    #   ivf_exact_equiv             ~1.0-2.5 s  (exact + pruned search pair;
    #                               isolated median 1.76 s, sweep spikes to
    #                               4 s on ivf_* adjacency)
    #   stream_click_purchase_join  ~2.6-4.5 s  (two-stream micro-batch
    #                               replay harness; isolated median 3.8 s,
    #                               sweep spread 2.6-7.1 s)
    #   minhash_operating_points    ~14-25 s    (deliberately the most
    #                               expensive key: FOUR banding self-joins
    #                               + the exact prefix-Jaccard truth kernel
    #                               per run — a one-off TUNING artifact,
    #                               not a production-path cost; see
    #                               RECALL.md round-8 table)
    headline_keys = [
        "ivf_search_nprobe1_cached",
        "topk768_expr",
        "topk768_arrow",
        "topk768_pq_adc",
        "pq768_encode",
        "batch100_sec_per_query",
        "skewjoin_salted_no_aqe_sec",
        "skewjoin_plain_aqe_skew_sec",
        "skewjoin_plain_no_aqe_sec",
        "topk_cosine",
        "batch_topk_cosine",
        "ivf_search_pruned",
        "dedup_minhash_lsh",
        "lineitem_pricing_summary",
        "sessionization",
        "chunk_search_hashed",
        "semantic_dedup",
        "dsir_log_weights",
        "mor_upsert_read",
        "mor_delete_read",
        "ivfpq_residual_search",
        "hybrid_search_rrf",
        "paragraph_dedup_stats",
        "bigram_lm_ppl",
        "minhash_dedup_flags",
        "stream_minhash_dedup_flags",
        "sqlite_store_scan",
        "ivf_shard_rebalance",
        "topk768_sq8_adc",
        "sq8_rerank_topk",
        "ivf_sq8_search",
        "ivf_recall_curve",
        "knn_triangle_stats",
        "pmi_top_pairs",
        "purchase_negative_samples",
        "hard_negatives_join_topk",
        "sqlite_store_stream_ingest",
        "mor_vacuum_read",
        "knn_graph_lsh",
        "knn_graph_lsh_capped",
        "dedup_embedding_cosine_lsh",
        "cms_heavy_hitters",
        "kmv_order_year_overlap",
        "stream_cms_heavy_hitters",
        "winnow_shared_span_pairs",
        "shared_span_longest_run",
        "binary_asym_topk",
        "substring_dedup_excised_stats",
        "bloom_decontaminate_stats",
        "winnow_dup_flags",
        "stream_winnow_dup_flags",
    ]
    compact = dict(full)
    compact["queries"] = {
        k: per_query[k] for k in headline_keys if k in per_query
    }
    compact["n_queries_full"] = len(per_query)
    compact["full_results"] = "BENCH_FULL.json"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
