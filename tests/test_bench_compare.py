"""bench.py --compare contract: per-query ratios vs a recorded round,
>1.3x flags, driver 'parsed' wrapper unwrapping."""

import json
import sys

sys.path.insert(0, "/root/repo")
import bench


def test_compare_block_flags_regressions(tmp_path):
    prev = {
        "parsed": {  # driver-recorded BENCH_r{N}.json shape
            "value": 100000.0,
            "queries": {"q_fast": 1.0, "q_slow": 2.0, "q_gone": 5.0},
        }
    }
    p = tmp_path / "BENCH_r01.json"
    p.write_text(json.dumps(prev))
    result = {
        "value": 80000.0,
        "queries": {"q_fast": 1.5, "q_slow": 1.9, "q_new": 0.5},
    }
    block = bench.compare_block(result, str(p))
    assert block["per_query_ratio_cur_over_prev"] == {"q_fast": 1.5, "q_slow": 0.95}
    assert block["regressions_gt_1p3x"] == ["q_fast"]
    assert block["headline_slowdown_vs_prev"] == 1.25  # prev/cur: >1 = slower


def test_compare_block_unwrapped_shape(tmp_path):
    p = tmp_path / "b.json"
    p.write_text(json.dumps({"value": 10.0, "queries": {"q": 1.0}}))
    block = bench.compare_block({"value": 10.0, "queries": {"q": 1.0}}, str(p))
    assert block["regressions_gt_1p3x"] == []


def test_compare_block_null_parsed_is_not_fatal(tmp_path):
    """BENCH_r03's driver artifact carried "parsed": null (stdout tail
    overflow) — the round-4 full bench crashed on it AFTER 70 minutes
    of measurement. A null/empty baseline must degrade to an empty
    compare, never raise."""
    p = tmp_path / "BENCH_r03.json"
    p.write_text(json.dumps({"n": 3, "rc": 0, "tail": "...", "parsed": None}))
    block = bench.compare_block({"value": 10.0, "queries": {"q": 1.0}}, str(p))
    assert block["per_query_ratio_cur_over_prev"] == {}
    assert block["regressions_gt_1p3x"] == []


def test_median_growth_ratio():
    # warm-up batch 0 and final dup batch excluded; medians over halves
    assert abs(bench._median_growth([8.0, 10.0, 11.0, 10.5, 10.6, 10.4, 10.8, 17.0]) - 1.0) < 0.05
    # one noisy batch does not set the number
    assert bench._median_growth([8.0, 10.0, 10.0, 10.0, 10.0, 30.0, 10.0, 17.0]) == 1.0
    # genuine growth still shows
    assert bench._median_growth([8.0, 10.0, 11.0, 12.0, 20.0, 22.0, 24.0, 30.0]) > 1.5
    assert bench._median_growth([1.0, 2.0, 3.0]) is None  # too short
