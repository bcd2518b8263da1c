"""bench.py round-delta recovery from driver-wrapped BENCH artifacts."""

from __future__ import annotations

import importlib.util
import json


def _bench():
    spec = importlib.util.spec_from_file_location("bench_mod", "/root/repo/bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_recover_from_truncated_tail():
    b = _bench()
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": 38.1,
            "queries": {"q1": 1.5, "q2": 0.25},
            "calibration": {"spark_range_sum_sec": 1.1, "python_loop_sec": 0.15},
        }
    )
    # driver keeps only the LAST N chars — cut the front mid-key
    tail = line[17:]
    times, cal = b._recover_from_tail(tail)
    assert times == {"q1": 1.5, "q2": 0.25}
    assert cal["spark_range_sum_sec"] == 1.1


def test_recover_gives_empty_when_dict_is_cut():
    b = _bench()
    # truncation lands INSIDE the queries dict: must return {}, not junk
    times, cal = b._recover_from_tail('5, "q2": 0.25}, "calibration": {"a": 1}}')
    assert times == {}
    assert cal == {"a": 1}


def test_previous_round_times_reads_real_artifacts():
    """Against the repo's real artifacts the loader must find the
    newest complete record — a BENCH_LOCAL file or history line, NOT
    the driver-wrapped BENCH_r files whose queries dict the summary-
    line tail truncation destroyed from r10 on (the round-13 fix:
    deltas/flags had silently compared against round-5 walls)."""
    b = _bench()
    n, times, factor, median, repeats = b._previous_round_times()
    assert n is not None and n >= 12
    # ADVICE r13: the baseline is never a SUFFIXED record of the
    # current round (a builder's own earlier same-code run); the plain
    # current-round record (the driver's previous-code run) is allowed
    assert n <= b._current_round_n()
    assert len(times) > 50
    assert median is not None  # median-pair normalization engages
    # repeat walls surface for repeat-vs-repeat regression deltas
    assert isinstance(repeats, dict) and len(repeats) > 0
    assert all(isinstance(v, float) for v in repeats.values())
    # sf pinning: an sf nothing was ever recorded at yields the
    # BENCH_r fallback (round <= 5, the last full wrapper payload)
    n2, t2, _, med2, _rep2 = b._previous_round_times(sf=0.5)
    assert (n2 is None or n2 <= 5) and med2 is None


def test_persist_local_writes_roundtrippable_json(tmp_path, monkeypatch):
    """_persist_local writes BENCH_LOCAL_r{N}.json (N = max on-disk
    CORRECTNESS round + 1) whose contents round-trip exactly — the
    durable artifact that makes driver stdout truncation harmless."""
    b = _bench()
    # stage a fake repo root with round artifacts 1..6
    for n in (1, 6):
        (tmp_path / f"CORRECTNESS_r{n}.json").write_text("{}")
    monkeypatch.setattr(
        b.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    payload = {
        "metric": "headline_queries_total_wall",
        "value": 1.23,
        "queries": {"q1": 0.5, "q2": 0.73},
        "calibration": {"spark_range_sum_sec": 1.1},
    }
    path = b._persist_local(payload)
    assert path == str(tmp_path / "BENCH_LOCAL_r7.json")
    assert json.load(open(path)) == payload
    # a second run in the same round must NOT clobber the first (the
    # builder and the driver can both claim the same N — round 8 lost
    # the driver's round-7 record to that overlap): suffixes b, c, ...
    path2 = b._persist_local({"queries": {"q1": 9.9}})
    assert path2 == str(tmp_path / "BENCH_LOCAL_r7b.json")
    assert json.load(open(path)) == payload  # original intact
    path3 = b._persist_local({"queries": {}})
    assert path3 == str(tmp_path / "BENCH_LOCAL_r7c.json")


def test_persist_local_survives_unwritable_dir(tmp_path, monkeypatch):
    b = _bench()
    target = tmp_path / "nodir" / "bench.py"  # parent doesn't exist
    monkeypatch.setattr(b.os.path, "abspath", lambda p: str(target))
    assert b._persist_local({"queries": {}}) is None


def test_headline_covers_all_gated_tpch_and_rollup_rows():
    """Every gated TPC-H shape and mergeable-rollup row is benched from
    birth (VERDICT r6 #8) — a gated query missing from HEADLINE has no
    perf trend."""
    b = _bench()
    for name in [
        "tpch_q7_nation_volume",
        "tpch_q9_nation_profit",
        "tpch_q11_important_parts",
        "tpch_q13_cust_distribution",
        "tpch_q15_top_supplier",
        "tpch_q20_dominant_supplier",
        "tpch_q22_idle_balances",
        "histogram_totalprice",
        "quantile_rollup",
        "corpus_diff",
    ]:
        assert name in b.HEADLINE, name


def _stage(tmp_path, monkeypatch, b):
    monkeypatch.setattr(b.os.path, "abspath", lambda p: str(tmp_path / "bench.py"))


def test_iter_bench_records_falls_back_to_history(tmp_path, monkeypatch):
    """A record whose full file was folded into BENCH_HISTORY.jsonl and
    deleted (VERDICT r11 #3) must still be readable for round-over-round
    comparisons — rehydrated into the full-record shape, files winning
    over their own history line, newest (round, suffix) first."""
    b = _bench()
    _stage(tmp_path, monkeypatch, b)
    (tmp_path / "BENCH_LOCAL_r8.json").write_text(json.dumps({
        "queries": {"q1": 2.0},
        "flags": ["q1"],
        "calibration": {"spark_range_sum_median_sec": 0.5},
    }))
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps({
            "record": "BENCH_LOCAL_r7.json",
            "queries": {"q1": 1.0},
            "flags": [],
            "calibration_median_sec": 0.25,
            "aggregate_drift": {"flagged": True, "drift_pct": 9.0},
        })
        + "\n"
        + json.dumps({  # stale duplicate of the on-disk file: file wins
            "record": "BENCH_LOCAL_r8.json",
            "queries": {"q1": 99.0},
            "flags": ["stale"],
            "calibration_median_sec": 9.9,
        })
        + "\n"
        + "not json\n"  # corrupt lines are skipped, never fatal
    )
    recs = list(b._iter_bench_records())
    assert [n for n, _ in recs] == ["BENCH_LOCAL_r8.json", "BENCH_LOCAL_r7.json"]
    assert recs[0][1]["queries"] == {"q1": 2.0}  # file, not stale line
    r7 = recs[1][1]
    assert r7["queries"] == {"q1": 1.0}
    assert r7["calibration"]["spark_range_sum_median_sec"] == 0.25
    assert r7["regressions"]["aggregate_drift"]["flagged"] is True
    # the flag reader sees the newest record's flags through the file
    assert b._previous_record_flags() == ("BENCH_LOCAL_r8.json", ["q1"])
    # drift reference = newest complete record, carrying its drift flag
    name, times, med, flagged = b._drift_reference(None)
    assert name == "BENCH_LOCAL_r8.json" and med == 0.5 and flagged is False


def test_persist_local_appends_history_line(tmp_path, monkeypatch):
    b = _bench()
    _stage(tmp_path, monkeypatch, b)
    (tmp_path / "CORRECTNESS_r7.json").write_text("{}")
    payload = {
        "metric": "headline_queries_total_wall",
        "value": 3.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"q1": 1.0, "q2": 2.0},
        "flags": ["q2"],
        "host_factor": 1.1,
        "calibration": {"spark_range_sum_median_sec": 0.3},
        "regressions": {
            "persistent": [],
            "aggregate_drift": {"flagged": False, "drift_pct": 1.0},
        },
    }
    path = b._persist_local(payload)
    assert path.endswith("BENCH_LOCAL_r8.json")
    lines = (tmp_path / "BENCH_HISTORY.jsonl").read_text().splitlines()
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["record"] == "BENCH_LOCAL_r8.json"
    assert rec["queries"] == {"q1": 1.0, "q2": 2.0}
    assert rec["calibration_median_sec"] == 0.3
    assert rec["flags"] == ["q2"]
    assert rec["aggregate_drift"]["drift_pct"] == 1.0
    # second record in the same round appends, never truncates
    b._persist_local(payload)
    assert len((tmp_path / "BENCH_HISTORY.jsonl").read_text().splitlines()) == 2


def test_aggregate_drift_classification(tmp_path, monkeypatch):
    """The aggregate gate (VERDICT r11 #1, renormalized per VERDICT
    r14 #2): suite-median-normalized subset sum vs the newest unflagged
    record. A host-wide uniform move normalizes away (stays visible in
    drift_pct_raw only); a subset-SPECIFIC shared cost flags as
    `subset_shared_cost` (or plan-cost candidates when a member flags
    individually); persistence needs two consecutive flagged records.
    The spark.range probe median is recorded but never divides — a 4x
    probe excursion (the r14 probe_overcorrection pattern) cannot move
    drift_pct at all."""
    b = _bench()
    _stage(tmp_path, monkeypatch, b)
    sub = b._DRIFT_SUBSET[:12]
    # reference carries the subset plus 20 non-subset stable queries —
    # like the real suite (~22 subset rows of ~110), the subset is a
    # minority of the median pool
    extra = [f"llm_op_{i}" for i in range(20)]
    ref_times = {q: 1.0 for q in sub + extra}
    (tmp_path / "BENCH_LOCAL_r8.json").write_text(json.dumps({
        "queries": ref_times,
        "calibration": {"spark_range_sum_median_sec": 0.5},
    }))
    # host-wide uniform +30%: every shared query moves together ->
    # the suite median absorbs it; raw records it; gate stays quiet
    uniform = {q: 1.3 for q in sub + extra}
    blk = b._aggregate_drift(uniform, [], 0.5)
    assert blk["subset_n"] == 12 and blk["ref"] == "BENCH_LOCAL_r8.json"
    assert blk["drift_pct"] == 0.0 and blk["drift_pct_raw"] == 30.0
    assert blk["flagged"] is False and blk["classification"] == "none"
    assert blk["suite_ratio_median_vs_ref"] == 1.3
    # subset-specific +20% while the rest of the suite sits still ->
    # survives normalization (median stays ~1.0) and flags
    subset_only = {q: 1.2 for q in sub} | {q: 1.0 for q in extra}
    blk = b._aggregate_drift(subset_only, [], 0.5)
    assert blk["flagged"] is True
    assert blk["drift_pct"] == 20.0
    assert blk["classification"] == "subset_shared_cost"
    assert blk["persistent"] is False  # ref record carried no drift flag
    # a flagged subset member reclassifies as plan cost
    blk = b._aggregate_drift(subset_only, [sub[0]], 0.5)
    assert blk["classification"] == "plan_cost_candidates"
    assert blk["subset_query_flags"] == [sub[0]]
    # the probe CANNOT move the verdict: a 4x probe excursion with the
    # same walls yields byte-identical drift numbers (r14's persistent
    # probe_overcorrection firing is structurally impossible now)
    blk_probe = b._aggregate_drift(subset_only, [], 2.0)
    blk_base = b._aggregate_drift(subset_only, [], 0.5)
    assert blk_probe["drift_pct"] == blk_base["drift_pct"]
    assert blk_probe["classification"] == blk_base["classification"]
    assert blk_probe["probe_median_sec"] == 2.0  # diagnostic only
    # persistence: the reference record itself flagged -> persistent
    (tmp_path / "BENCH_LOCAL_r8b.json").write_text(json.dumps({
        "queries": ref_times,
        "calibration": {"spark_range_sum_median_sec": 0.5},
        "regressions": {"aggregate_drift": {"flagged": True}},
    }))
    blk = b._aggregate_drift(subset_only, [], 0.5)
    assert blk["flagged_prev"] is True and blk["persistent"] is True
    # too few common subset rows -> no block rather than a noisy one
    assert b._aggregate_drift({sub[0]: 1.0}, [], 0.5) is None
    # sf guard: a reference at a different scale factor never compares
    # (records predating the sf field count as sf0.1)
    assert b._aggregate_drift(subset_only, [], 0.5, sf=0.01) is None
    assert b._aggregate_drift(subset_only, [], 0.5, sf=0.1) is not None


def test_suite_ratio_median_stability():
    """_suite_ratio_median: median per-query raw ratio over shared
    queries >= 0.5 s at the reference; small/new/vanished queries and
    a single regressed outlier cannot move it; < 5 stable pairs falls
    back to 1.0 (raw comparison)."""
    b = _bench()
    ref = {f"q{i}": 1.0 for i in range(9)}
    ref["tiny"] = 0.1          # under the stability floor -> excluded
    now = {f"q{i}": 2.0 for i in range(9)}
    now["tiny"] = 50.0
    now["brand_new"] = 99.0    # not shared -> excluded
    now["q0"] = 40.0           # one genuine regression -> outvoted
    assert b._suite_ratio_median(now, ref) == 2.0
    # under 5 stable pairs: raw comparison
    assert b._suite_ratio_median({"a": 3.0}, {"a": 1.0}) == 1.0


def test_same_round_record_reads_latest_complete(tmp_path, monkeypatch):
    """_same_round_record finds the newest complete BENCH_LOCAL of the
    CURRENT round (latest suffix wins; incomplete records skipped) —
    the reference the driver's run self-adjudicates against."""
    b = _bench()
    (tmp_path / "CORRECTNESS_r7.json").write_text("{}")
    monkeypatch.setattr(
        b.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    assert b._same_round_record() is None
    (tmp_path / "BENCH_LOCAL_r8.json").write_text(json.dumps({
        "queries": {"q1": 1.0},
        "calibration": {"spark_range_sum_median_sec": 0.25},
    }))
    name, times, med = b._same_round_record()
    assert name == "BENCH_LOCAL_r8.json" and times == {"q1": 1.0} and med == 0.25
    # a later suffixed run supersedes; an incomplete one is skipped
    (tmp_path / "BENCH_LOCAL_r8b.json").write_text(json.dumps({
        "queries": {"q1": 2.0},
        "calibration": {"spark_range_sum_median_sec": 0.5},
    }))
    (tmp_path / "BENCH_LOCAL_r8c.json").write_text(json.dumps({"queries": {}}))
    name, times, med = b._same_round_record()
    assert name == "BENCH_LOCAL_r8b.json" and times == {"q1": 2.0}
    # other rounds' records never match
    (tmp_path / "BENCH_LOCAL_r9.json").write_text("{}")
    assert b._same_round_record()[0] == "BENCH_LOCAL_r8b.json"


def test_drift_reference_skips_flagged_records(tmp_path, monkeypatch):
    """The aggregate-drift MEASUREMENT baseline skips records that were
    themselves drift-flagged (VERDICT r12 #3: r12e ran under a mid-run
    load spike, got flagged +35.6%, became r13's reference and
    whipsawed a normal run to -44.3%), while the PERSISTENCE flag still
    reads the newest record. If every record is flagged, the newest
    wins as a last resort."""
    b = _bench()
    _stage(tmp_path, monkeypatch, b)
    (tmp_path / "BENCH_LOCAL_r8.json").write_text(json.dumps({
        "queries": {"q1": 1.0},
        "calibration": {"spark_range_sum_median_sec": 0.2},
        "regressions": {"aggregate_drift": {"flagged": False}},
    }))
    (tmp_path / "BENCH_LOCAL_r8b.json").write_text(json.dumps({
        "queries": {"q1": 1.4},
        "calibration": {"spark_range_sum_median_sec": 0.21},
        "regressions": {"aggregate_drift": {"flagged": True}},
    }))
    name, times, med, newest_flag = b._drift_reference(None)
    # measurement ref = the unflagged r8; persistence flag = newest (r8b)
    assert name == "BENCH_LOCAL_r8.json" and times == {"q1": 1.0}
    assert med == 0.2 and newest_flag is True
    # all-flagged fallback: newest record despite its flag
    (tmp_path / "BENCH_LOCAL_r8.json").write_text(json.dumps({
        "queries": {"q1": 1.0},
        "calibration": {"spark_range_sum_median_sec": 0.2},
        "regressions": {"aggregate_drift": {"flagged": True}},
    }))
    name, times, med, newest_flag = b._drift_reference(None)
    assert name == "BENCH_LOCAL_r8b.json" and newest_flag is True


def test_flagged_requires_repeat_confirmation():
    """A query with a same-session repeat wall flags only when the
    repeat's delta ALSO exceeds the threshold — one gust-inflated
    first wall (r13c: 41.7 s first, 3.9 s repeat) cannot flag; a real
    regression (slow both times) still does; queries without repeats
    keep the single-wall rule."""
    b = _bench()
    nf = {
        "gusty": {"spread_sec": 0.2, "repeat_sec": 1.0},
        "regressed": {"spread_sec": 0.2, "repeat_sec": 9.0},
    }
    deltas = {"gusty": 5.0, "regressed": 5.0, "norepeat": 5.0}
    repeats = {"gusty": 0.05, "regressed": 4.8}
    assert b._flagged(deltas, nf, repeats) == ["norepeat", "regressed"]
    # without repeat data the old single-wall behavior is unchanged
    assert b._flagged(deltas, nf) == ["gusty", "norepeat", "regressed"]
    # suite-median confirmation (round 14): a probe-pair artifact
    # inflates every PROBE-normalized delta while the suite-implied
    # deltas sit still — queries whose confirmation delta stays under
    # their spread cannot flag; a real regression (over threshold in
    # the suite-normalized view too) still does
    conf = {"gusty": 0.01, "regressed": 4.9, "norepeat": 0.02}
    assert b._flagged(deltas, nf, repeats, deltas_confirm=conf) == [
        "regressed"
    ]
    assert b._flagged(deltas, nf, deltas_confirm=conf) == ["regressed"]


def test_persist_local_never_reuses_history_claimed_names(tmp_path, monkeypatch):
    """A record folded into history (file deleted, line retained) frees
    its on-disk name; _persist_local must NOT re-claim it — two records
    sharing one history name made the rehydrator silently serve the
    first (stale) one's walls (round-14 incident)."""
    b = _bench()
    _stage(tmp_path, monkeypatch, b)
    (tmp_path / "CORRECTNESS_r7.json").write_text("{}")
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps({"record": "BENCH_LOCAL_r8.json", "queries": {"q": 1}})
        + "\n"
        + json.dumps({"record": "BENCH_LOCAL_r8b.json", "queries": {"q": 1}})
        + "\n"
    )
    path = b._persist_local({"queries": {"q": 2.0}})
    assert path.endswith("BENCH_LOCAL_r8c.json")


def test_previous_round_times_skips_suffixed_same_round(tmp_path, monkeypatch):
    """ADVICE r13: during round N the builder's own suffixed r{N}
    records (same code, earlier in the round) must not become the
    round-over-round baseline — but the PLAIN r{N} record stays
    eligible, because by the _persist_local convention it is the
    driver's end-of-round-(N-1) run (previous-round code). Null sf on
    rehydrated lines coalesces to 0.1 instead of matching any sf."""
    b = _bench()
    _stage(tmp_path, monkeypatch, b)
    (tmp_path / "CORRECTNESS_r8.json").write_text("{}")  # current round = 9
    (tmp_path / "BENCH_LOCAL_r9b.json").write_text(json.dumps({
        "queries": {"q1": 9.0},
        "sf": 0.1,
        "calibration": {"spark_range_sum_median_sec": 0.9},
    }))
    (tmp_path / "BENCH_LOCAL_r9.json").write_text(json.dumps({
        "queries": {"q1": 5.0},
        "sf": 0.1,
        "host_factor": 1.2,
        "calibration": {"spark_range_sum_median_sec": 0.5},
        "noise_floor": {"q1": {"first_sec": 5.0, "repeat_sec": 4.5}},
    }))
    n, times, factor, med, repeats = b._previous_round_times(sf=0.1)
    assert n == 9 and times == {"q1": 5.0} and med == 0.5
    assert repeats == {"q1": 4.5}
    # sf pin: a null-sf history line counts as 0.1, so an sf0.01 run
    # must NOT baseline against it (the exact mismatch ADVICE r13 named)
    (tmp_path / "BENCH_LOCAL_r9.json").unlink()
    (tmp_path / "BENCH_LOCAL_r9b.json").unlink()
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(json.dumps({
        "record": "BENCH_LOCAL_r7.json",
        "queries": {"q1": 1.0},
        "sf": None,
        "calibration_median_sec": 0.25,
        "repeat_walls": {"q1": 0.9},
    }) + "\n")
    n01, t01, _, med01, _rep01 = b._previous_round_times(sf=0.01)
    assert t01 == {} and med01 is None
    n1, t1, _, med1, rep1 = b._previous_round_times(sf=0.1)
    assert n1 == 7 and t1 == {"q1": 1.0} and med1 == 0.25
    # repeat walls survive rehydration from the compact history field
    assert rep1 == {"q1": 0.9}


def test_noise_entry_third_wall_adjudicates_gusts():
    """VERDICT r13 #3: a gust landing on either wall triggers a third
    wall; the recorded spread comes from the two closest walls, and
    repeat_sec is the min of the non-first walls, so one gusty wall
    can neither inflate future flag thresholds nor fake/suppress the
    repeat confirmation."""
    b = _bench()
    # gust on the REPEAT wall (r13's similarity_pq 9.55 -> 28.56 case)
    reruns = iter([28.56, 9.8])
    e = b._noise_entry(9.55, lambda: next(reruns))
    assert e["walls"] == [9.55, 28.56, 9.8]
    assert e["repeat_sec"] == 9.8
    assert e["spread_sec"] == round(9.8 - 9.55, 3)
    assert e["spread_pct"] < 60.0
    # gust on the FIRST wall (r13c's 41.7 first / 3.9 repeat case)
    reruns = iter([3.9, 4.1])
    e = b._noise_entry(41.7, lambda: next(reruns))
    assert e["walls"] == [41.7, 3.9, 4.1]
    assert e["repeat_sec"] == 3.9
    assert e["spread_sec"] == round(4.1 - 3.9, 3)
    # agreeing walls: no third run, legacy two-wall shape
    reruns = iter([2.1])
    e = b._noise_entry(2.0, lambda: next(reruns))
    assert "walls" not in e
    assert e["repeat_sec"] == 2.1 and e["spread_sec"] == 0.1
    # gusty-FAST repeat (review finding): the closest pair is
    # (9.5, 10.0), not the two smallest (3.0, 9.5) — the fluke-fast
    # wall can neither inflate the spread nor become repeat_sec
    reruns = iter([3.0, 9.5])
    e = b._noise_entry(10.0, lambda: next(reruns))
    assert e["walls"] == [10.0, 3.0, 9.5]
    assert e["spread_sec"] == 0.5
    assert e["repeat_sec"] == 9.5
    # zero-wall degenerate case stays finite
    reruns = iter([0.0])
    e = b._noise_entry(0.0, lambda: next(reruns))
    assert e["spread_pct"] == 0.0


def test_perq_array_reconstructs_walls_in_headline_order():
    """VERDICT r15 #2: the final summary line carries a positional
    array of 1-decimal walls in HEADLINE order plus an order hash, so
    a reader holding only that line (the driver keeps just the stdout
    tail) can reconstruct every per-query wall. Pin the recipe both
    sides must agree on."""
    import hashlib

    import bench

    times = {q: 0.1 * (i % 7) + 0.3 for i, q in enumerate(bench.HEADLINE)}
    perq = [round(times[q], 1) for q in bench.HEADLINE]
    order_hash = hashlib.md5(
        ",".join(bench.HEADLINE).encode()
    ).hexdigest()[:8]
    # reconstruction: zip(HEADLINE, perq) recovers the walls to 0.1 s
    rebuilt = dict(zip(bench.HEADLINE, perq))
    assert all(abs(rebuilt[q] - times[q]) <= 0.05 + 1e-9 for q in times)
    assert len(perq) == len(bench.HEADLINE)
    assert len(order_hash) == 8
