"""Tests for the bench.py subprocess harness (VERDICT r2 #1).

The r2 artifact reported 0.0 rays/s because one cold tunnel compile ate the
whole alarm and two transient remote-compile HTTP 500s were recorded as
final. These tests pin the fixes: per-workload subprocess isolation, retry
of transient failures, timeout kill of the exact child process group, and
headline fallback to the best surviving workload.
"""

import importlib.util
import json
import os
import sys
import time

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _cpu_children(monkeypatch):
    # Child processes must not touch the TPU tunnel during tests; bench.py
    # honors JAX_PLATFORMS via apply_platform_env().
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestRetryClassifier:
    def test_transient_markers(self, bench):
        assert bench._is_retryable(
            "JaxRuntimeError: INTERNAL: http://127.0.0.1:8093/remote_compile:"
            " HTTP 500: tpu_compile_helper subprocess exit code 1"
        )
        assert bench._is_retryable("timeout after 480s")
        assert bench._is_retryable("UNAVAILABLE: socket closed")

    def test_deterministic_errors_not_retried(self, bench):
        assert not bench._is_retryable("TypeError: bad argument")
        assert not bench._is_retryable("ValueError: unknown config keys")


class TestSubprocessHarness:
    def test_ok_roundtrip(self, bench, monkeypatch):
        monkeypatch.setenv("ONDT_BENCH_SELFTEST_MODE", "ok")
        res = bench._spawn("_selftest", warm=False, timeout_s=120)
        assert res["ok"] and res["result"]["rays_per_sec_per_chip"] == 123.0
        warm = bench._spawn("_selftest", warm=True, timeout_s=120)
        assert warm["ok"] and warm["result"] == {"warmed": True}

    def test_fatal_error_marked_non_retryable(self, bench, monkeypatch):
        monkeypatch.setenv("ONDT_BENCH_SELFTEST_MODE", "fatal")
        res = bench._spawn("_selftest", warm=False, timeout_s=120)
        assert not res["ok"]
        assert "deterministic config error" in res["error"]
        assert not res["retryable"]

    def test_timeout_kills_child(self, bench, monkeypatch):
        monkeypatch.setenv("ONDT_BENCH_SELFTEST_MODE", "hang")
        t0 = time.monotonic()
        res = bench._spawn("_selftest", warm=False, timeout_s=8)
        assert time.monotonic() - t0 < 60
        assert not res["ok"] and res["retryable"]
        assert "timeout" in res["error"]

    def test_flaky_transient_is_retried(self, bench, monkeypatch, tmp_path):
        """First attempt fails with the exact r2 HTTP-500 signature; the
        harness must retry and succeed instead of recording the error."""
        counter = str(tmp_path / "attempts")
        monkeypatch.setenv("ONDT_BENCH_SELFTEST_MODE", "flaky")
        monkeypatch.setenv("ONDT_BENCH_SELFTEST_COUNTER", counter)
        monkeypatch.setattr(bench, "RETRY_BACKOFF_S", 0)
        deadline = time.monotonic() + 300
        result = bench._run_workload("_selftest", deadline)
        assert result.get("rays_per_sec_per_chip") == 123.0
        # single-pass harness: attempt 1 failed (retryable), attempt 2 ran.
        assert int(open(counter).read()) == 2

    def test_budget_reserve_for_queued_workloads(self, bench, monkeypatch):
        """With the remaining budget fully reserved for queued workloads,
        the current one must yield without spawning (r4: the budget
        drained on mip before ngp's turn)."""
        monkeypatch.setenv("ONDT_BENCH_SELFTEST_MODE", "ok")
        deadline = time.monotonic() + 3 * bench.RESERVE_PER_QUEUED_S
        result = bench._run_workload("_selftest", deadline, n_queued=3)
        assert "budget exhausted" in result["error"]


class TestHeadlineFallback:
    def _main_output(self, bench, monkeypatch, canned, capsys):
        monkeypatch.setattr(
            bench, "_run_workload",
            lambda name, deadline, n_queued=0: canned[name],
        )
        monkeypatch.setenv(
            "ONDT_BENCH_WORKLOADS", "nerfpp,mip,ngp,ngp_eval"
        )
        bench.main()
        lines = [
            l for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        # One cumulative headline line per completed workload (VERDICT r3
        # #1a): a driver kill at any point leaves the latest parseable line.
        assert len(lines) == 4
        for i, l in enumerate(lines):
            partial = json.loads(l)
            assert len(partial["workloads"]) == i + 1
            assert partial["baseline_kind"] == "estimate"
        return json.loads(lines[-1])

    def test_primary_headline(self, bench, monkeypatch, capsys):
        canned = {
            "nerfpp_1024": {"rays_per_sec_per_chip": 38000.0},
            "mip_4096": {"rays_per_sec_per_chip": 50000.0},
            "ngp_8192": {"rays_per_sec_per_chip": 5000.0},
            "ngp_eval": {"rays_per_sec_per_chip": 15000.0},
        }
        out = self._main_output(bench, monkeypatch, canned, capsys)
        assert out["value"] == 38000.0
        assert out["headline_workload"] == "nerfpp_1024"

    def test_fallback_when_primary_errors(self, bench, monkeypatch, capsys):
        """The r2 failure shape: nerfpp timed out, mip survived. The
        headline must be mip's number, not 0.0."""
        canned = {
            "nerfpp_1024": {"error": "timeout after 480s"},
            "mip_4096": {"rays_per_sec_per_chip": 49898.5, "mfu_pct": 79.1},
            "ngp_8192": {"error": "remote_compile HTTP 500"},
            "ngp_eval": {"error": "remote_compile HTTP 500"},
        }
        out = self._main_output(bench, monkeypatch, canned, capsys)
        assert out["value"] == 49898.5
        assert out["headline_workload"] == "mip_4096"
        assert out["vs_baseline"] > 0

    def test_all_failed(self, bench, monkeypatch, capsys):
        canned = {
            k: {"error": "boom"}
            for k in ("nerfpp_1024", "mip_4096", "ngp_8192", "ngp_eval")
        }
        out = self._main_output(bench, monkeypatch, canned, capsys)
        assert out["value"] == 0.0
        assert out["headline_workload"] is None

    def test_ngp_runs_before_mip(self, bench):
        order = [n for n in bench.BENCHES if not n.startswith("_")]
        assert order.index("ngp_8192") < order.index("mip_4096")
        assert order.index("ngp_eval") < order.index("mip_4096")

    def test_empty_filter_still_prints_headline(self, bench, monkeypatch,
                                                capsys):
        """ADVICE r4 #3: filtering out every workload must still leave one
        parseable headline line."""
        monkeypatch.setenv("ONDT_BENCH_WORKLOADS", "none_of_them")
        bench.main()
        lines = [
            l for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        assert len(lines) == 1
        out = json.loads(lines[0])
        assert out["value"] == 0.0 and out["workloads"] == {}
