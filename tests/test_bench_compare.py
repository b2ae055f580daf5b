"""tools/bench_compare.py: drift-deflated cross-round comparison."""

import json
import sys

sys.path.insert(0, "tools")
from bench_compare import compare, load_bench  # noqa: E402


def _rec(queries, canary=None):
    return {
        "queries": queries,
        "total": sum(queries.values()),
        "canary_sec": canary,
    }


def test_canary_deflation_preferred():
    old = _rec({"a": 1.0, "b": 2.0}, canary=1.0)
    new = _rec({"a": 1.5, "b": 3.0}, canary=1.5)  # pure 1.5x ambient
    out = compare(old, new)
    assert out["ambient_used"] == "canary"
    assert out["canary_ratio"] == 1.5
    assert out["deflated_ratio"] == 1.0
    assert out["outliers"] == {}


def test_median_fallback_and_outlier_flag():
    old = _rec({"a": 1.0, "b": 2.0, "c": 1.0})
    # ambient ~1.1x, but c regressed 4x: flagged beyond ambient*band
    new = _rec({"a": 1.1, "b": 2.2, "c": 4.0})
    out = compare(old, new, band=1.5)
    assert out["ambient_used"] == "median"
    assert out["median_query_ratio"] == 1.1
    assert list(out["outliers"]) == ["c"]
    assert out["outliers"]["c"]["ratio"] == 4.0


def test_sub_threshold_queries_excluded_from_ratio():
    # queries under 0.3s are stage-overhead noise, not drift signal
    old = _rec({"tiny": 0.05, "big": 2.0})
    new = _rec({"tiny": 0.25, "big": 2.0})  # tiny "5x" must not skew
    out = compare(old, new)
    assert out["n_ratioed"] == 1
    assert out["median_query_ratio"] == 1.0


def test_load_bench_driver_tail_format(tmp_path):
    # the driver keeps a 2000-char tail: totals + slowest queries only
    p = tmp_path / "BENCH.json"
    p.write_text(json.dumps({
        "n": 1, "rc": 0,
        "tail": '"q_fast": 0.4, "q_slow": 5.0, "total": 5.4, '
                '"n_queries": 2, "n_failed": 0, "canary_sec": 2.5, '
                '"loadavg_1m": 0.5, "loadavg_5m": 1.0, "sf": 0.1}',
        "parsed": None,
    }))
    rec = load_bench(str(p))
    assert rec["queries"] == {"q_fast": 0.4, "q_slow": 5.0}
    assert rec["total"] == 5.4
    assert rec["canary_sec"] == 2.5


def test_load_bench_raw_line(tmp_path):
    p = tmp_path / "bench.json"
    p.write_text(json.dumps({
        "queries": {"a": 1.0, "b": -1.0}, "total": 1.0, "canary_sec": 2.0,
    }))
    rec = load_bench(str(p))
    assert rec["queries"] == {"a": 1.0}  # failures (-1) dropped


def test_changed_queries_excluded_from_ambient():
    # 12 untouched queries at exactly 1.2x ambient; one rewritten query
    # genuinely 3x faster. Without exclusion the improvement would drag
    # the 'ambient' median down and deflate itself away.
    old = _rec({f"u{i}": 1.0 for i in range(12)} | {"rewritten": 6.0})
    new = _rec({f"u{i}": 1.2 for i in range(12)} | {"rewritten": 2.0})
    out = compare(old, new, changed={"rewritten"})
    assert out["n_ambient_pool"] == 12
    assert out["median_query_ratio"] == 1.2
    sub = out["changed_subtotal"]
    assert sub["n"] == 1 and sub["old"] == 6.0 and sub["new"] == 2.0
    # deflated: (2/6)/1.2 — the real improvement survives deflation
    # (the tool rounds to 3 decimals)
    assert abs(sub["deflated_ratio"] - (2.0 / 6.0) / 1.2) < 5e-4


def test_median_preferred_over_canary_on_large_pool():
    # the pure-CPU canary misses memory/GC pressure; with >= 10
    # untouched queries the per-query median wins, canary stays visible
    old = _rec({f"u{i}": 1.0 for i in range(10)}, canary=1.0)
    new = _rec({f"u{i}": 1.1 for i in range(10)}, canary=0.8)
    out = compare(old, new)
    assert out["ambient_used"] == "median"
    assert out["median_query_ratio"] == 1.1
    assert out["canary_ratio"] == 0.8


def test_all_changed_fallback_labelled_distinctly():
    # When EVERY shared query changed (no untouched pool, no canary),
    # the only median available is over the changed queries themselves
    # — the self-deflation bias must be visible in the label (ADVICE
    # r10), never silently reported as an untouched-query 'median'.
    old = _rec({"a": 2.0, "b": 4.0})
    new = _rec({"a": 1.0, "b": 2.0})
    out = compare(old, new, changed={"a", "b"})
    assert out["n_ambient_pool"] == 0
    assert out["ambient_used"] == "median-all-changed"
    assert out["median_query_ratio"] is None  # no untouched median


def test_all_changed_prefers_canary_when_present():
    old = _rec({"a": 2.0, "b": 4.0}, canary=1.0)
    new = _rec({"a": 1.0, "b": 2.0}, canary=1.1)
    out = compare(old, new, changed={"a", "b"})
    assert out["ambient_used"] == "canary"


def test_ambient_flag_roundtrips_and_surfaces(tmp_path):
    """r12 (VERDICT task #2): bench.py emits ambient_flag; load_bench
    recovers it from both the raw line and the driver's truncated
    tail, and compare() surfaces both sides so a 'busy' record is
    mechanically discountable."""
    raw = {
        "metric": "total_query_wall_seconds", "value": 2.0,
        "unit": "sec", "queries": {"a": 1.0, "b": 1.0},
        "total": 2.0, "canary_sec": 0.9, "ambient_flag": "busy",
        "loadavg_1m": 9.0, "sf": 0.1,
    }
    p = tmp_path / "raw.json"
    p.write_text(json.dumps(raw))
    rec = load_bench(str(p))
    assert rec["ambient_flag"] == "busy"

    tail = (
        '"a": 1.0, "b": 1.0, "total": 2.0, "canary_sec": 0.9, '
        '"ambient_flag": "busy_retried_clean", "loadavg_1m": 2.0, '
        '"sf": 0.1}'
    )
    pw = tmp_path / "wrapped.json"
    pw.write_text(json.dumps({"n": 2, "rc": 0, "tail": tail}))
    rec2 = load_bench(str(pw))
    assert rec2["ambient_flag"] == "busy_retried_clean"

    out = compare(
        {**_rec({"a": 1.0}, canary=1.0), "ambient_flag": "clean"},
        {**_rec({"a": 1.0}, canary=1.0), "ambient_flag": "busy"},
    )
    assert out["old_ambient_flag"] == "clean"
    assert out["new_ambient_flag"] == "busy"
