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
