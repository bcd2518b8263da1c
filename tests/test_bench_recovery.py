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
    """Against the repo's real BENCH_r*.json files the loader must find
    the newest parsable round (>= 5, the driver-wrapped tail format)."""
    b = _bench()
    n, times, factor, median = b._previous_round_times()
    assert n is not None and n >= 5
    assert len(times) > 10


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
