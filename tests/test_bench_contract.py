"""Driver-contract tests for bench.py's supervisor harness.

Round 4's official artifact (BENCH_r04.json) was lost to a 408 s remote
compile starving the driver's timeout: rc 124, no JSON line. These tests
pin the hardened contract — `python bench.py` ALWAYS prints exactly one
valid JSON line on stdout, whether it completes, is SIGTERMed mid-run (the
driver's `timeout`), is killed before any measurement lands, or exhausts
its own --budget-s.

Uses the NEMOTRON_TPU_BENCH_FAKE child hook (synthetic results, no device,
no jax import) so the harness logic is testable on the CPU-only suite.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _spawn(extra_args=(), delay="0.05", env_extra=None):
    env = dict(os.environ)
    env["NEMOTRON_TPU_BENCH_FAKE"] = "1"
    env["NEMOTRON_TPU_BENCH_FAKE_DELAY"] = delay
    env.update(env_extra or {})
    return subprocess.Popen(
        [sys.executable, BENCH, *extra_args],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)


def _one_json_line(stdout: str) -> dict:
    lines = [l for l in stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got: {lines!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "concurrent_realtime_streams_80ms"
    assert rec["unit"] == "streams/chip"
    assert "value" in rec and "vs_baseline" in rec
    return rec


def test_clean_completion_emits_one_json_line():
    p = _spawn()
    out, err = p.communicate(timeout=60)
    rec = _one_json_line(out)
    assert p.returncode == 0
    assert rec["value"] > 0
    assert "partial" not in rec
    assert rec["config"] in ("kv_int8", "bf16")


def test_sigterm_mid_run_emits_best_so_far():
    # slow fake passes: kill after the first couple of results landed
    p = _spawn(delay="0.5")
    deadline = time.time() + 30
    # wait until the child produced at least one RESULT (parent logs pass
    # lines to stderr; poll on elapsed time instead of output to keep the
    # pipe undisturbed)
    time.sleep(1.2)
    assert p.poll() is None, "bench exited before we could signal it"
    p.send_signal(signal.SIGTERM)
    out, err = p.communicate(timeout=30)
    rec = _one_json_line(out)
    assert p.returncode == 0
    assert rec["value"] > 0, f"expected a best-so-far value, err={err[-500:]}"
    assert rec.get("partial") is True
    assert time.time() < deadline


def test_sigterm_before_any_result_reports_error():
    p = _spawn(delay="30")  # first fake result would take 30 s
    time.sleep(0.8)
    p.send_signal(signal.SIGTERM)
    out, err = p.communicate(timeout=30)
    rec = _one_json_line(out)
    assert p.returncode == 1
    assert rec["value"] == 0
    assert "error" in rec


def test_budget_alarm_emits_partial():
    # 1 s budget, results every 0.4 s: the alarm fires with a best in hand
    p = _spawn(extra_args=["--budget-s", "1"], delay="0.4")
    out, err = p.communicate(timeout=30)
    rec = _one_json_line(out)
    assert p.returncode == 0
    assert rec["value"] > 0
    # either the alarm fired (partial) or all 8 fast fake passes finished
    # within the second — both satisfy the contract; partial is the
    # expected path at this pacing
    if "partial" in rec:
        assert rec["partial"] is True


def test_repeated_kills_always_harvest_json():
    """VERDICT round-4 'done' criterion: kill bench.py at arbitrary points
    repeatedly and always get a valid JSON line."""
    for kill_after in (0.3, 0.9, 1.5):
        p = _spawn(delay="0.4")
        time.sleep(kill_after)
        if p.poll() is None:
            p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=30)
        _one_json_line(out)
