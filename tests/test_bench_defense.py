"""bench.py artifact defense (VERDICT r5 item 2): deviation detection vs
the committed BENCH_FULL.json — pure-Python, no Spark."""

import json
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import _committed_bench, _deviant_keys


def test_deviant_keys_both_directions_and_skips():
    committed = {"a": 1.0, "b": 1.0, "c": 1.0, "d": -1.0, "f": 1.0}
    measured = {
        "a": 1.6,    # >1.25x slower -> deviant
        "b": 0.5,    # >1.25x faster -> deviant
        "c": 1.2,    # inside the band
        "d": 2.0,    # committed failed -> skip
        "e": 9.9,    # new key, no committed value -> skip
        "f": -1.0,   # measured failed -> skip
    }
    assert sorted(_deviant_keys(measured, committed)) == ["a", "b"]
    assert _deviant_keys(measured, {}) == []
    # custom band
    assert _deviant_keys({"a": 1.4}, {"a": 1.0}, ratio=1.3) == ["a"]
    assert _deviant_keys({"a": 1.3}, {"a": 1.0}, ratio=1.35) == []
    # default band is 1.25 (VERDICT r7 item 4: the 13 keys that rode
    # through at 1.3-1.48x on untouched code must now be adjudicated)
    assert _deviant_keys({"a": 1.35}, {"a": 1.0}) == ["a"]


def test_committed_bench_reads_head_artifact(tmp_path):
    repo = pathlib.Path(__file__).resolve().parent.parent
    got = _committed_bench(str(repo))
    # HEAD carries the adjudicated r5 artifact
    expect = json.loads(
        subprocess.run(
            ["git", "show", "HEAD:BENCH_FULL.json"],
            cwd=repo,
            capture_output=True,
            check=True,
        ).stdout
    )
    assert got == expect and got.get("queries")
    # non-repo dir -> {}
    assert _committed_bench(str(tmp_path)) == {}


def test_defense_skips_cross_sf_comparison():
    """A committed artifact from a different scale factor must not be
    used as the deviation reference — every key would 'deviate' and the
    defense would re-measure the whole sweep."""
    from bench import _reference_queries

    full = {"sf": 0.1, "queries": {"a": 1.0}}
    assert _reference_queries(full, 0.1) == {"a": 1.0}
    assert _reference_queries(full, 0.001) == {}
    assert _reference_queries({}, 0.1) == {}


def test_defense_plan_routes_one_shot_cells_to_group_rerun():
    """VERDICT r6 item 2: bench-internal one-shot cells (topk768_*,
    sq768_encode, pq768_encode, batch100, skewjoin_*) must no longer be
    skipped by the defense — they re-run via their owning harness group,
    each group at most once even when several of its cells deviated."""
    from bench import _defense_plan

    key_to_group = {
        "topk768_expr": "highdim",
        "topk768_arrow": "highdim",
        "topk768_pq_adc": "pq",
        "pq768_encode": "pq",
        "sq768_encode": "sq8",
        "ivf_search_nprobe1_cached": "headline",
    }
    registry = {"topk_cosine", "dedup_minhash_lsh"}
    per_key, groups = _defense_plan(
        ["topk768_expr", "topk768_arrow", "pq768_encode", "topk_cosine"],
        registry,
        key_to_group,
    )
    assert per_key == ["topk_cosine"]
    # highdim listed once despite two deviant cells; pq for its one cell
    assert groups == ["highdim", "pq"]
    # no deviants -> nothing to do
    assert _defense_plan([], registry, key_to_group) == ([], [])


def test_defense_plan_routes_are_disjoint():
    """ADVICE r7: a key in BOTH the registry and key_to_group must take
    the per-key path ONLY — double-routing would let the later group
    re-run overwrite the per-key isolated number and record it as the
    adjudication 'sweep' value."""
    from bench import _defense_plan

    key_to_group = {"shared": "grp", "cell": "grp2"}
    registry = {"shared", "other"}
    per_key, groups = _defense_plan(
        ["shared", "cell"], registry, key_to_group
    )
    assert per_key == ["shared"]
    assert groups == ["grp2"]  # grp NOT re-run for the per-key'd key


def test_contention_guard_thresholds():
    """Module-policy guard: a run that adjudicates an outsized slice of
    keys SLOWER than committed is itself contended and must stamp the
    artifact; faster-than-committed adjudications never trip it."""
    from bench import _contention_guard, _slow_adjudicated

    assert not _contention_guard(0, 228)
    assert not _contention_guard(15, 228)   # at the floor, not past it
    assert not _contention_guard(22, 228)   # 22 <= max(15, 22)
    assert _contention_guard(31, 228)       # the r6 driver-refresh case
    assert _contention_guard(16, 100)       # past the floor on small sweeps

    # drift ceiling (tightened 1.30 -> 1.15, ADVICE r10): honest idle
    # drift is 1.05-1.08x and passes; the r10 laundering scenario (fleet
    # drift 1.28x hiding 1.5x per-key slowdowns inside the normalized
    # band) now refuses on drift alone, with zero slow-adjudications
    assert not _contention_guard(0, 274, drift=1.08)
    assert _contention_guard(0, 274, drift=1.28)
    assert _contention_guard(0, 274, drift=1.16)

    # deviation-tail ceiling (ADVICE r10): a moderate-median run with a
    # heavy slow tail (p90/median > 1.30) refuses even when the drift
    # and the slow count both stay quiet; honest tails measure 1.15-1.18
    assert not _contention_guard(0, 274, drift=1.06, tail=1.18)
    assert _contention_guard(0, 274, drift=1.06, tail=1.45)

    # only slow deviations count toward the guard: a quiet run correcting
    # an inflated committed reference adjudicates many FAST keys (r8 saw
    # 42 fast / 13 slow of 55) and must not stamp the artifact
    adj = {
        "fast1": {"sweep": 0.5, "committed": 1.0, "isolated": 0.5},
        "fast2": {"sweep": 0.7, "committed": 1.0, "isolated": 0.7},
        "slow1": {"sweep": 1.5, "committed": 1.0, "isolated": 1.4},
        "inband": {"sweep": 1.2, "committed": 1.0, "isolated": 1.1},
    }
    assert _slow_adjudicated(adj) == 1


def test_ratio_tail_catches_partial_contention():
    """_ratio_tail is p90/median of raw sweep/committed ratios: a
    contended 15% slice at 1.6x moves p90 but not the median, producing
    the tail signature the r10 laundering window exploited."""
    from bench import _contention_guard, _fleet_drift, _ratio_tail

    committed = {f"k{i}": 1.0 for i in range(100)}
    honest = {f"k{i}": 1.06 for i in range(100)}
    assert _ratio_tail(honest, committed) == 1.0  # uniform -> flat tail

    # 15 of 100 keys read 1.6x while the fleet reads 1.06x: median stays
    # 1.06 (drift passes the 1.15 ceiling), but p90 = 1.6 -> tail ~1.51
    contended = {
        f"k{i}": (1.6 if i >= 85 else 1.06) for i in range(100)
    }
    drift = _fleet_drift(contended, committed)
    tail = _ratio_tail(contended, committed)
    assert drift < 1.15
    assert tail > 1.30
    assert _contention_guard(0, 100, drift=drift, tail=tail)

    assert _ratio_tail({}, committed) == 1.0
    assert _ratio_tail(honest, {}) == 1.0


def _good_canary(drift=1.18, age_sec=600.0, load=0.5):
    import time as _time

    return {
        "ts": _time.time() - age_sec,
        "drift": drift,
        "loadavg1": load,
        "verdict": "WAIT",
    }


def test_drift_confirmation_band():
    """Round-11 ratchet fix (hardened per ADVICE r11): drift in
    (MAX_DRIFT, HARD_DRIFT] passes ONLY when the adjudicated keys'
    isolated re-measures confirm the drift (median iso/committed >=
    drift - 0.05 over >= 20 adjudications) AND a fresh idle-host
    pre-sweep canary corroborates out-of-band; above HARD_DRIFT always
    refuses; the r6 vanish-on-isolation signature never confirms."""
    from bench import _contention_guard, _drift_confirmed

    def adj(iso_ratio, n=30):
        return {
            f"k{i}": {"sweep": 1.4, "committed": 1.0, "isolated": iso_ratio}
            for i in range(n)
        }

    canary = _good_canary()
    # reproducible host state: deviants still ~drift-slow in isolation
    # and the pre-sweep canary saw the elevated host
    assert _drift_confirmed(1.17, adj(1.16), canary=canary)
    assert not _contention_guard(
        0, 275, drift=1.17, tail=1.23, confirmed=True
    )
    # r6-style contention: deviants revert toward committed when alone
    assert not _drift_confirmed(1.17, adj(1.02), canary=canary)
    assert _contention_guard(
        0, 275, drift=1.17, tail=1.23, confirmed=False
    )
    # polluted-slow isolateds still confirm (conservative direction: the
    # run is then judged by the tail and slow-count signatures)
    assert _drift_confirmed(1.17, adj(1.30), canary=canary)
    # not enough adjudications = no evidence = no confirmation
    assert not _drift_confirmed(1.17, adj(1.16, n=5), canary=canary)
    # the hard ceiling is unconditional
    assert not _drift_confirmed(1.30, adj(1.29), canary=canary)
    assert _contention_guard(0, 275, drift=1.30, confirmed=True)
    # below the soft ceiling nothing changes
    assert not _contention_guard(0, 275, drift=1.08, confirmed=False)


def test_drift_confirmation_requires_out_of_band_canary():
    """ADVICE r11: same-run isolated re-measures cannot distinguish a
    background load sustained across the whole run from durable host
    state — both keep deviants slow in isolation. Confirmation therefore
    also needs the pre-sweep host_canary reading: fresh, taken on an
    idle host, and itself already elevated."""
    from bench import _canary_corroborates, _drift_confirmed

    def adj(iso_ratio, n=30):
        return {
            f"k{i}": {"sweep": 1.4, "committed": 1.0, "isolated": iso_ratio}
            for i in range(n)
        }

    # no canary recorded -> never confirmed, however reproducible
    assert not _drift_confirmed(1.17, adj(1.16))
    assert not _drift_confirmed(1.17, adj(1.16), canary=None)
    # stale canary (older than CANARY_MAX_AGE_SEC) -> describes some
    # other day's host, not this sweep's
    assert not _drift_confirmed(
        1.17, adj(1.16), canary=_good_canary(age_sec=7 * 3600)
    )
    # canary taken under load -> the elevation could BE the load
    assert not _drift_confirmed(
        1.17, adj(1.16), canary=_good_canary(load=12.0)
    )
    # GO-grade canary (1.02x) then an in-band sweep drift: the slowdown
    # arrived DURING the run — the contention signature
    assert not _drift_confirmed(
        1.17, adj(1.16), canary=_good_canary(drift=1.02)
    )
    # malformed recording never confirms
    assert not _canary_corroborates({"drift": "nan?"})
    assert not _canary_corroborates({})
    # the full good reading confirms (direct check of the helper)
    assert _canary_corroborates(_good_canary())


def test_canary_must_predate_the_sweep_start():
    """ADVICE r12: freshness was measured at the end-of-sweep check, so
    a canary written MID-SWEEP could corroborate a rebase. With the
    sweep's start time passed through, the probe must predate it — and
    its age window is anchored there too."""
    import time as _time

    from bench import CANARY_MAX_AGE_SEC, _canary_corroborates, _drift_confirmed

    def adj(iso_ratio, n=30):
        return {
            f"k{i}": {"sweep": 1.4, "committed": 1.0, "isolated": iso_ratio}
            for i in range(n)
        }

    now = _time.time()
    sweep_start = now - 2400.0  # a 40-minute sweep just finished
    pre = _good_canary(age_sec=3000.0)   # 10 min before the sweep
    mid = _good_canary(age_sec=1200.0)   # written 20 min INTO the sweep
    assert _canary_corroborates(pre, sweep_start=sweep_start)
    assert not _canary_corroborates(mid, sweep_start=sweep_start)
    assert _drift_confirmed(
        1.17, adj(1.16), canary=pre, sweep_start=sweep_start
    )
    assert not _drift_confirmed(
        1.17, adj(1.16), canary=mid, sweep_start=sweep_start
    )
    # the age window is anchored at sweep start, not at the check: a
    # probe that was already CANARY_MAX_AGE_SEC old when the sweep began
    # is stale even if "now - ts" would still pass
    old_probe = _good_canary(age_sec=2400.0 + CANARY_MAX_AGE_SEC + 60)
    assert not _canary_corroborates(old_probe, sweep_start=sweep_start)
    # without a sweep_start the helper falls back to the conservative
    # now-anchored window (legacy callers)
    assert _canary_corroborates(_good_canary())


def test_adjudication_publishes_isolated_median_not_min():
    """ADVICE r11: publishing min(sweep, isolated) selected the lower
    noise tail on every adjudicated key, ratcheting the committed
    reference faster each refresh. The published value is the isolated
    median (the same 1-warmup+median-of-3 protocol every committed
    number uses); the sweep value is kept only in the documented
    JVM-pollution case (isolated > ISO_POLLUTION_RATIO x sweep)."""
    from bench import _publish_adjudicated

    # isolated slightly above sweep -> isolated published (the old min()
    # would have kept the faster sweep reading)
    assert _publish_adjudicated(1.00, 1.10) == (1.10, "isolated")
    # isolated below sweep also publishes isolated — symmetric protocol
    assert _publish_adjudicated(1.00, 0.80) == (0.80, "isolated")
    # pollution case (measured: sweep 0.60 s vs isolated 3.94 s): the
    # sweep value is published, loudly labeled
    val, label = _publish_adjudicated(0.60, 3.94)
    assert val == 0.60 and "polluted" in label
    # exactly at the ratio boundary is NOT pollution
    assert _publish_adjudicated(1.00, 2.00) == (2.00, "isolated")


def test_canary_recording_round_trips_into_the_guard(tmp_path):
    """Schema contract between scripts/host_canary.py's recording and
    bench's reader: a file written with the script's exact shape must
    load via _read_canary and corroborate via _canary_corroborates —
    so the two sides cannot drift apart silently."""
    import json
    import time as _time

    from bench import CANARY_FILE, _canary_corroborates, _read_canary

    # the exact dict shape host_canary.py json.dump's
    recorded = {
        "ts": _time.time(),
        "drift": 1.18,
        "loadavg1": 0.25,
        "verdict": "WAIT",
    }
    with open(tmp_path / CANARY_FILE, "w") as fh:
        json.dump(recorded, fh)
    loaded = _read_canary(str(tmp_path))
    assert loaded == recorded
    assert _canary_corroborates(loaded)
    # absent file -> None -> never corroborates
    assert _read_canary(str(tmp_path / "nowhere")) is None
    assert not _canary_corroborates(None)


def test_epoch_rebase_gate():
    """VERDICT r12 item 1: the principled exit from a wedged bench
    system is an explicit provenance-stamped baseline EPOCH change, not
    a widened ceiling. `_epoch_rebase_verdict` accepts only the full
    wedge state: drift above HARD_DRIFT, a pre-sweep idle canary itself
    reading >= HARD_DRIFT, internally-quiet relative signatures, and
    isolation agreement over a real sample."""
    import time as _time

    from bench import _epoch_rebase_verdict

    now = _time.time()
    start = now - 3600.0
    wedge_canary = {"ts": start - 600, "drift": 1.5, "loadavg1": 0.2}

    def adj(iso_ratio, n=25):
        return {
            f"k{i}": {"sweep": 1.45, "committed": 1.0, "isolated": iso_ratio}
            for i in range(n)
        }

    base = dict(
        drift=1.45,
        tail=1.1,
        n_slow=3,
        n_keys=276,
        adjudicated=adj(1.43),
        canary=wedge_canary,
        sweep_start=start,
    )
    ok, why = _epoch_rebase_verdict(**base)
    assert ok and "isolation agreement" in why

    # below the hard ceiling the normal machinery applies
    assert not _epoch_rebase_verdict(**{**base, "drift": 1.2})[0]
    # no canary / canary written mid-sweep / loaded canary / GO-grade
    # canary: no out-of-band wedge evidence
    assert not _epoch_rebase_verdict(**{**base, "canary": None})[0]
    assert not _epoch_rebase_verdict(
        **{**base, "canary": {**wedge_canary, "ts": start + 600}}
    )[0]
    assert not _epoch_rebase_verdict(
        **{**base, "canary": {**wedge_canary, "loadavg1": 12.0}}
    )[0]
    assert not _epoch_rebase_verdict(
        **{**base, "canary": {**wedge_canary, "drift": 1.1}}
    )[0]
    # internally-contended runs never become a reference
    assert not _epoch_rebase_verdict(**{**base, "tail": 1.5})[0]
    assert not _epoch_rebase_verdict(**{**base, "n_slow": 60})[0]
    # isolation evidence: enough keys, and they must not revert
    assert not _epoch_rebase_verdict(
        **{**base, "adjudicated": adj(1.43, n=5)}
    )[0]
    assert not _epoch_rebase_verdict(
        **{**base, "adjudicated": adj(1.05)}
    )[0]


def test_epoch_archive_never_overwritten(tmp_path):
    """The superseded reference is preserved as BENCH_FULL.epoch{N}.json
    exactly once; a second archive call cannot clobber it."""
    import json

    from bench import _archive_epoch

    committed = {"epoch": 1, "value": 0.1672, "queries": {"q": 1.0}}
    name = _archive_epoch(str(tmp_path), committed)
    assert name == "BENCH_FULL.epoch1.json"
    with open(tmp_path / name) as fh:
        assert json.load(fh) == committed
    _archive_epoch(str(tmp_path), {"epoch": 1, "value": 9.9})
    with open(tmp_path / name) as fh:
        assert json.load(fh)["value"] == 0.1672


def test_fast_host_does_not_inflate_relative_signatures():
    """Round-13 measured case: a host FASTER than the committed
    reference (fleet median < 1.0 — sweeps read 0.963-0.984x on
    2026-08-17) inflated p90/median past MAX_TAIL (p90 1.2497 -> 'tail'
    1.3012) and tightened the drift-centered slow band below the
    absolute 1.25x it was calibrated with. Both statistics clamp their
    median normalizer at 1.0: contention can only ever push the median
    UP, so the clamp relaxes nothing a contended run could exploit, and
    every drift >= 1.0 regime is byte-identical to the r11 calibration."""
    from bench import _ratio_tail, _slow_adjudicated

    committed = {f"k{i}": 1.0 for i in range(100)}
    # uniform 0.96x fleet with an honest p90 spread at ~1.24 absolute
    fast = {f"k{i}": 0.96 for i in range(90)}
    fast.update({f"k{i}": 1.24 for i in range(90, 100)})
    tail = _ratio_tail(fast, committed)
    assert tail <= 1.30, tail  # 1.24/1.0, not 1.24/0.96=1.29+
    # the same shape shifted to a SLOW median still computes the real
    # ratio (no clamp effect at drift >= 1)
    slow = {k: v * 1.10 for k, v in fast.items()}
    assert _ratio_tail(slow, committed) > 1.2

    # slow-count band: at drift 0.96 a key at 1.22x absolute is inside
    # the calibrated 1.25x band, not bursty
    adjudicated = {
        "a": {"sweep": 1.22, "committed": 1.0, "isolated": 1.0},
        "b": {"sweep": 1.30, "committed": 1.0, "isolated": 1.0},
    }
    assert _slow_adjudicated(adjudicated, drift=0.96) == 1  # only b
    # at drift 1.10 the band still scales UP with the drift as before
    assert _slow_adjudicated(adjudicated, drift=1.10) == 0
