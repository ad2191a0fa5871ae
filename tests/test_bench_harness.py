"""Fault-injection tests for the bench.py capture harness.

Round 2's official perf record was lost to one flaky extra + a driver
timeout; round 4's was lost again because nothing printed before the first
measurement completed (both BENCH_rNN.json: rc=124, parsed=null). These
tests prove the hardened harness (a) emits a parseable JSON line as the
FIRST stdout output — before any backend check or measurement — and (b)
always leaves the headline as the FINAL JSON line, across every injected
failure mode: a hanging extra, a crashing extra, a failed/hung headline
measurement, a failed backend init, wall-clock budget expiry, a SIGKILL
seconds after start, and a budget too small for the extras. The heavy TPU
measurements are stubbed via BENCH_FAKE=1 (see bench._fake) — what's under
test is the capture orchestration, not the timing.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
BENCH = REPO / "bench.py"


def base_env(tmp_path, extra_env):
    env = dict(
        os.environ,
        BENCH_FAKE="1",
        BENCH_CACHE=str(tmp_path / "cache.json"),
        BENCH_HEADLINE_FALLBACK=str(tmp_path / "headline.json"),
        BENCH_EXTRA_TIMEOUT_S="15",
        BENCH_BUDGET_S="90",
        # the production reserve (60 s) is wall-clock margin for the real
        # driver; at test scale it would swallow the whole budget
        BENCH_RESERVE_S="0",
    )
    env.update(extra_env)
    return env


def run_bench(tmp_path, extra_env, timeout=120):
    return subprocess.run(
        [sys.executable, str(BENCH)], capture_output=True, text=True,
        timeout=timeout, env=base_env(tmp_path, extra_env))


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
    # headline printed after measurement and re-printed after each of the
    # 4 extras (no pre-emit line: the cache starts empty)
    assert final_line(out)["metric"] == "fake stage1"
    assert sum(1 for l in lines if l["metric"] == "fake stage1") == 5
    assert {"fake cfg_sampling", "fake edm", "fake edm_dpmpp",
            "fake stage1_scan"} <= {l["metric"] for l in lines}
    # headline cached for future fallback (session + committed copy)
    assert json.loads(
        (tmp_path / "cache.json").read_text())["headline"]["value"] == 1.0
    assert json.loads(
        (tmp_path / "headline.json").read_text())["value"] == 1.0


def test_pre_emit_is_first_stdout_line(tmp_path):
    """The FIRST stdout line must be the cached headline, printed before the
    backend check or any measurement — the whole round-4 fix."""
    seed_cache(tmp_path, value=555.0)
    out = run_bench(tmp_path, {"BENCH_SKIP_EXTRAS": "1"})
    assert out.returncode == 0, out.stderr
    first = out.stdout.splitlines()[0]
    pre = json.loads(first)  # not just the first JSON line: the first LINE
    assert pre["value"] == 555.0
    assert pre.get("cached") is True
    assert "pre-emit" in pre.get("note", "")
    # the fresh measurement still lands afterwards and wins the final line
    last = final_line(out)
    assert last["value"] == 1.0
    assert "cached" not in last


def test_sigkill_shortly_after_start_leaves_parseable_record(tmp_path):
    """SIGKILL while the first measurement is still running (what a driver
    timeout does) must leave the pre-emitted headline on stdout."""
    seed_cache(tmp_path, value=555.0)
    env = base_env(tmp_path, {"BENCH_FAKE_SLEEP": "100000",
                              "BENCH_SKIP_EXTRAS": "1"})
    outf = tmp_path / "stdout.txt"
    with outf.open("w") as fh:
        proc = subprocess.Popen(
            [sys.executable, str(BENCH)], stdout=fh,
            stderr=subprocess.DEVNULL, env=env, start_new_session=True)
        try:
            deadline = time.time() + 30
            while time.time() < deadline and not outf.read_text().strip():
                time.sleep(0.2)
        finally:
            # kill the whole group: the parent AND its hung measurement
            # subprocess (no pattern-matching kills)
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
    lines = [json.loads(l) for l in outf.read_text().splitlines()
             if l.startswith("{")]
    assert lines, "no JSON on stdout at SIGKILL time"
    assert lines[0]["value"] == 555.0
    assert lines[0].get("cached") is True


def test_cold_programs_fast_compile_first_then_full(tmp_path):
    """Cold stage-1 programs must land a fast-compile number FIRST, then
    upgrade to a full-effort measurement when budget allows."""
    out = run_bench(tmp_path, {"BENCH_FAKE_COLD": "1",
                               "BENCH_FULL_EFFORT_MIN_S": "0",
                               "BENCH_SKIP_EXTRAS": "1"})
    assert out.returncode == 0, out.stderr
    lines = [l for l in json_lines(out) if l["metric"] == "fake stage1"]
    assert lines[0].get("fast_compile") is True
    assert "fast_compile" not in lines[-1]  # full-effort wins the tail


def test_extras_skipped_when_budget_cannot_fit_them(tmp_path):
    """An extra whose timeout exceeds the remaining wall clock is skipped
    with a logged reason, not started-and-killed."""
    seed_cache(tmp_path, value=111.0)
    out = run_bench(tmp_path, {"BENCH_BUDGET_S": "8",
                               "BENCH_EXTRA_TIMEOUT_S": "120"})
    assert out.returncode == 0, out.stderr
    assert "skip extra" in out.stderr
    assert final_line(out)["metric"] == "fake stage1"
    assert "fake cfg_sampling" not in {l["metric"] for l in json_lines(out)}


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
    assert {"fake edm", "fake edm_dpmpp", "fake stage1_scan"} <= metrics


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


def test_scan_dispatch_promoted_to_headline_when_it_wins(tmp_path):
    """When the freshly measured scan-dispatch throughput beats the
    per-step number, it becomes the headline (final JSON line) AND the
    last-known-good fallback for future pre-emits — the production trainer
    defaults to scan dispatch for long runs, so the headline should too."""
    out = run_bench(tmp_path, {"BENCH_FAKE_SCAN_VALUE": "2.5"})
    assert out.returncode == 0, out.stderr
    last = final_line(out)
    assert last["metric"] == "fake stage1_scan"
    assert last["value"] == 2.5
    assert "promoted" in out.stderr
    assert json.loads(
        (tmp_path / "headline.json").read_text())["value"] == 2.5
    assert json.loads(
        (tmp_path / "cache.json").read_text())["headline"]["value"] == 2.5


def test_promoted_headline_survives_next_run(tmp_path):
    """After a promotion, the cached headline IS the scan metric; on the
    next run the fresh per-step measurement is lower, but the scan extra
    re-promotes — the final line never ratchets down while scan keeps
    winning (the flow of two consecutive real bench runs)."""
    (tmp_path / "cache.json").write_text(json.dumps({
        "headline": {"metric": "fake stage1_scan", "value": 2.5,
                     "unit": "fake/sec", "vs_baseline": None}}))
    out = run_bench(tmp_path, {"BENCH_FAKE_SCAN_VALUE": "2.5"})
    assert out.returncode == 0, out.stderr
    lines = json_lines(out)
    assert lines[0]["metric"] == "fake stage1_scan"  # pre-emit
    assert lines[0].get("cached") is True
    # fresh per-step measurement (1.0) is emitted mid-run...
    assert any(l["metric"] == "fake stage1" and l["value"] == 1.0
               for l in lines)
    # ...but the scan extra re-promotes and wins the final line
    last = final_line(out)
    assert last["metric"] == "fake stage1_scan"
    assert last["value"] == 2.5
    assert "cached" not in last


def _stage1_fingerprint():
    """Compute the fingerprint the way bench.py does (BENCH_FAKE=1 skips
    the jax-version component, so this stays jax-free)."""
    out = subprocess.run(
        [sys.executable, "-c",
         "import bench; print(bench._stage1_fingerprint())"],
        capture_output=True, text=True, cwd=str(REPO),
        env=dict(os.environ, BENCH_FAKE="1"))
    return out.stdout.strip()


def test_scan_extra_full_effort_only_when_fingerprinted(tmp_path):
    """The stage1_scan extra must run at full effort ONLY when a prior
    full-effort measurement fingerprinted the program into the cache — a
    cold scan body's hour-scale full-effort compile can never fit an
    extra's budget, so cold runs get a fast_compile-tagged number."""
    # cold: no fingerprint -> fast-compile mode
    out = run_bench(tmp_path, {})
    lines = {l["metric"]: l for l in json_lines(out)}
    assert lines["fake stage1_scan"].get("fast_compile") is True

    # warm: fingerprint recorded -> full effort (no fast_compile tag)
    (tmp_path / "cache.json").write_text(json.dumps(
        {"stage1_scan_fingerprint": _stage1_fingerprint()}))
    out = run_bench(tmp_path, {})
    lines = {l["metric"]: l for l in json_lines(out)}
    assert "fast_compile" not in lines["fake stage1_scan"]


def test_budget_expiry_emits_best_known_headline(tmp_path):
    seed_cache(tmp_path, value=444.0)
    # the headline measurement hangs; its explicit (absolute) timeout
    # outlives the 5 s wall-clock budget, so the SIGALRM path must fire and
    # the cached number still lands as the final line, rc 0
    out = run_bench(tmp_path, {"BENCH_FAKE_HANG": "stage1",
                               "BENCH_BUDGET_S": "5",
                               "BENCH_MIN_MEASURE_S": "1",
                               "BENCH_HEADLINE_TIMEOUT_S": "60",
                               "BENCH_SKIP_EXTRAS": "1"})
    assert out.returncode == 0, out.stderr
    last = final_line(out)
    assert last["value"] == 444.0
    assert "budget" in last.get("note", "")
