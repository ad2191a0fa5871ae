"""Fault-injection tests for the bench.py capture harness.

Round 2's official perf record was lost to one flaky extra + a driver
timeout (BENCH_r02.json: rc=124, parsed=null). These tests prove the
hardened harness always leaves the headline as the FINAL JSON line on
stdout, across every injected failure mode: a hanging extra, a crashing
extra, a failed headline measurement, a failed backend init, and a
wall-clock budget expiry. The heavy TPU measurements are stubbed via
BENCH_FAKE=1 (see bench._fake) — what's under test is the capture
orchestration, not the timing.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
BENCH = REPO / "bench.py"


def run_bench(tmp_path, extra_env, timeout=120):
    env = dict(
        os.environ,
        BENCH_FAKE="1",
        BENCH_CACHE=str(tmp_path / "cache.json"),
        BENCH_HEADLINE_FALLBACK=str(tmp_path / "headline.json"),
        BENCH_EXTRA_TIMEOUT_S="15",
        BENCH_BUDGET_S="90",
    )
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, str(BENCH)], capture_output=True, text=True,
        timeout=timeout, env=env)


def json_lines(out):
    lines = []
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            lines.append(json.loads(line))
    return lines


def final_line(out):
    lines = json_lines(out)
    assert lines, f"no JSON lines in stdout:\n{out.stdout}\n{out.stderr}"
    return lines[-1]


def seed_cache(tmp_path, value=111.0):
    (tmp_path / "cache.json").write_text(json.dumps({
        "headline": {"metric": "fake stage1", "value": value,
                     "unit": "fake/sec", "vs_baseline": None}}))


def test_normal_run_headline_last(tmp_path):
    out = run_bench(tmp_path, {})
    assert out.returncode == 0, out.stderr
    lines = json_lines(out)
    # headline printed first and re-printed after each of the 3 extras
    assert final_line(out)["metric"] == "fake stage1"
    assert sum(1 for l in lines if l["metric"] == "fake stage1") == 4
    assert {"fake cfg_sampling", "fake edm", "fake edm_dpmpp"} <= {
        l["metric"] for l in lines}
    # headline cached for future fallback (session + committed copy)
    assert json.loads(
        (tmp_path / "cache.json").read_text())["headline"]["value"] == 1.0
    assert json.loads(
        (tmp_path / "headline.json").read_text())["value"] == 1.0


# The injected per-extra timeout must cover a subprocess interpreter start
# (~2.3 s bare on this host, more when loaded; BENCH_FAKE skips the jax
# import entirely so that's the whole cost) or the surviving extras / the
# fast-compile retry get killed before they can emit — the timeout only
# needs to be shorter than the injected hang (100000 s), not short.
HANG_TIMEOUT_S = "12"


def test_hanging_extra_cannot_stall_the_run(tmp_path):
    out = run_bench(tmp_path, {"BENCH_FAKE_HANG": "cfg_sampling",
                               "BENCH_EXTRA_TIMEOUT_S": HANG_TIMEOUT_S})
    assert out.returncode == 0, out.stderr
    assert final_line(out)["metric"] == "fake stage1"
    assert "killed after" in out.stderr
    # the other extras still ran
    metrics = {l["metric"] for l in json_lines(out)}
    assert {"fake edm", "fake edm_dpmpp"} <= metrics


def test_hung_cfg_sampling_retries_in_fast_compile_mode(tmp_path):
    """A cold full-effort sampler compile that overruns its budget (the
    round-3 failure mode) must land a fast-compile number instead of
    dropping config #4 from the record."""
    out = run_bench(tmp_path, {"BENCH_FAKE_HANG": "cfg_sampling",
                               "BENCH_EXTRA_TIMEOUT_S": HANG_TIMEOUT_S})
    assert out.returncode == 0, out.stderr
    lines = {l["metric"]: l for l in json_lines(out)}
    assert "fake cfg_sampling" in lines
    assert lines["fake cfg_sampling"].get("fast_compile") is True
    assert final_line(out)["metric"] == "fake stage1"


def test_crashing_extra_cannot_kill_the_headline(tmp_path):
    out = run_bench(tmp_path, {"BENCH_FAKE_FAIL": "edm"})
    assert out.returncode == 0, out.stderr
    assert final_line(out)["metric"] == "fake stage1"
    assert "fake edm" not in {l["metric"] for l in json_lines(out)}


def test_failed_headline_falls_back_to_cache(tmp_path):
    seed_cache(tmp_path, value=111.0)
    out = run_bench(tmp_path, {"BENCH_FAKE_FAIL": "stage1",
                               "BENCH_SKIP_EXTRAS": "1"})
    assert out.returncode == 0, out.stderr
    last = final_line(out)
    assert last["value"] == 111.0
    assert last.get("cached") is True


def test_failed_headline_without_cache_errors(tmp_path):
    out = run_bench(tmp_path, {"BENCH_FAKE_FAIL": "stage1",
                               "BENCH_SKIP_EXTRAS": "1"})
    assert out.returncode != 0


def test_failed_backend_falls_back_to_cache(tmp_path):
    seed_cache(tmp_path, value=222.0)
    out = run_bench(tmp_path, {"BENCH_FAKE_FAIL": "backend"})
    assert out.returncode == 0, out.stderr
    last = final_line(out)
    assert last["value"] == 222.0
    assert last.get("cached") is True


def test_committed_fallback_serves_fresh_clone(tmp_path):
    # no session cache, only the committed results/bench_headline.json copy
    (tmp_path / "headline.json").write_text(json.dumps(
        {"metric": "fake stage1", "value": 333.0, "unit": "fake/sec",
         "vs_baseline": None}))
    out = run_bench(tmp_path, {"BENCH_FAKE_FAIL": "backend"})
    assert out.returncode == 0, out.stderr
    assert final_line(out)["value"] == 333.0


def test_budget_expiry_emits_best_known_headline(tmp_path):
    seed_cache(tmp_path, value=444.0)
    # headline measurement sleeps past the 3 s budget -> alarm fires and the
    # cached number still lands as the final line, rc 0
    out = run_bench(tmp_path, {"BENCH_FAKE_SLEEP": "30",
                               "BENCH_BUDGET_S": "3",
                               "BENCH_SKIP_EXTRAS": "1"})
    assert out.returncode == 0, out.stderr
    last = final_line(out)
    assert last["value"] == 444.0
    assert "budget" in last.get("note", "")
