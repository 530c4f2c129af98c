"""bench.py stdout contract: the driver captures only the LAST 2,000
characters of stdout, so the single JSON line must stay under that with
headroom (BENCH_r07 went unparseable when the line hit ~2,420 chars).
These tests exercise the pure payload-splitting helper with the real
HEADLINE/EXTRA rosters so growth in either set trips the gate here,
not in the driver's record."""

from __future__ import annotations

import json

import bench


def _fake_result():
    timings = {name: 12.345 for name in bench.HEADLINE}
    spread = {name: [11.111, 13.999] for name in bench.HEADLINE}
    cold = {name: 19.999 for name in bench.HEADLINE}
    extra = {name: 12.345 for name in bench.EXTRA}
    extra["skew_q25_sessionization"] = 1.234
    extra["skew_q27_asof_join"] = 1.234
    total = round(sum(timings.values()), 3)
    env = {"load": [32.11, 32.22, 32.33], "spin_ms": 123.4, "cpus": 32}
    return timings, total, spread, cold, extra, env


def test_stdout_line_under_driver_tail_capture():
    timings, total, spread, cold, extra, env = _fake_result()
    line, _ = bench.build_payloads(timings, total, "0.1", 5, spread, cold, extra, env)
    serialized = json.dumps(line)
    assert len(serialized) < 1800, (
        f"bench stdout line is {len(serialized)} chars; the driver tail "
        "capture is 2,000 — shrink the line (move detail to the sidecar)"
    )


def test_stdout_line_has_required_keys_and_all_headline_queries():
    timings, total, spread, cold, extra, env = _fake_result()
    line, sidecar = bench.build_payloads(timings, total, "0.1", 5, spread, cold, extra, env)
    for key in ("metric", "value", "unit", "queries", "sf", "runs_per_query", "env"):
        assert key in line
    assert set(line["queries"]) == set(bench.HEADLINE)
    assert line["value"] == total
    # load evidence rides BOTH payloads: the driver records only stdout
    assert line["env"] == env and sidecar["env"] == env
    # full-precision detail lives in the sidecar, not the line
    assert "spread" not in line and "cold" not in line and "extra" not in line
    assert sidecar["spread"] == spread
    assert sidecar["cold"] == cold
    assert sidecar["extra"] == extra


def test_stdout_line_roundtrips_as_single_json_line():
    timings, total, spread, cold, extra, env = _fake_result()
    line, _ = bench.build_payloads(timings, total, "0.1", 5, spread, cold, extra, env)
    serialized = json.dumps(line)
    assert "\n" not in serialized
    assert json.loads(serialized) == line


def test_machine_load_evidence_shape():
    env = bench.machine_load_evidence()
    assert set(env) == {"load", "spin_ms", "cpus"}
    assert env["spin_ms"] > 0
    assert env["load"] is None or len(env["load"]) == 3
