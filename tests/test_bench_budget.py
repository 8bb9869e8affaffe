"""Unit coverage for bench.py's budget/backstop machinery.

The driver captures exactly one artifact per round from `python bench.py`
(BENCH_rNN.json), so the pieces that decide whether that artifact exists
— env parsing, the result schema, and the SIGTERM backstop — get direct
tests here.  The measurement path itself is exercised on the real TPU
(RUN_TPU tier + the driver run); these tests are pure-CPU and fast.
"""

import json
import os
import signal
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench


def test_env_int_parses_and_falls_back(monkeypatch, capsys):
    monkeypatch.delenv("BENCH_X", raising=False)
    assert bench._env_int("BENCH_X", 7) == 7
    monkeypatch.setenv("BENCH_X", "42")
    assert bench._env_int("BENCH_X", 7) == 42
    monkeypatch.setenv("BENCH_X", "20m")  # malformed: fall back, warn
    assert bench._env_int("BENCH_X", 7) == 7
    assert "malformed" in capsys.readouterr().err


def test_result_schema_and_baseline_ratio():
    r = bench._result(bench.BASELINE_EVALS_PER_SEC * 100)
    assert r["metric"] == "probflow_logprob_evals_per_sec_hutchinson_rtol1e-5"
    assert r["unit"] == "evals/s"
    assert r["vs_baseline"] == pytest.approx(100.0)
    json.dumps(r)  # driver-parseable


def test_sigterm_backstop_emits_best_result():
    """A SIGTERM after a measurement exists must print that measurement
    and exit 0 (the rc=124-with-no-output failure mode of round 2);
    before any measurement it must exit 3."""
    prog = textwrap.dedent(
        """
        import os, signal, sys
        sys.path.insert(0, {repo!r})
        import bench
        bench._install_sigterm_backstop()
        if sys.argv[1] == "armed":
            bench._BEST_RESULT = bench._result(1234567.0)
        os.kill(os.getpid(), signal.SIGTERM)
        # unreachable if the handler exits
        print("HANDLER DID NOT FIRE")
        sys.exit(9)
        """
    ).format(repo=REPO)

    out = subprocess.run(
        [sys.executable, "-c", prog, "armed"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    parsed = json.loads(out.stdout.strip().splitlines()[-1])
    assert parsed["value"] == 1234567.0

    out = subprocess.run(
        [sys.executable, "-c", prog, "unarmed"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 3
    assert "SIGTERM before any measurement" in out.stderr


def test_preflight_budget_clamps_to_one_probe(monkeypatch):
    """A caller-computed budget below one probe length degenerates to a
    single short probe instead of an instant give-up: the preflight must
    still try once.  Probe command is stubbed to succeed instantly."""
    calls = []

    class FakeCompleted:
        returncode = 0

    def fake_run(*a, **kw):
        calls.append(kw.get("timeout"))
        return FakeCompleted()

    import subprocess as _sp

    monkeypatch.setattr(_sp, "run", fake_run)
    bench._device_preflight(timeout_s=5, total_budget_s=0)
    assert calls, "preflight never probed"
