"""Backend health diagnostic (utils/diagnose.py).

The probe subprocess is pointed at the CPU backend via the JAX_PLATFORMS
environment variable (read at backend-init time in the child — unlike the
in-process override conftest uses for THIS process).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from hyperpocket_tpu.utils import diagnose


@pytest.fixture()
def cpu_probe_env(monkeypatch):
    # JAX_PLATFORMS env alone is too late in children (the axon
    # sitecustomize imports jax at interpreter start); the probe reads
    # HPCD_DIAG_PLATFORM and applies the pre-init config update.
    monkeypatch.setenv("HPCD_DIAG_PLATFORM", "cpu")


def test_probe_cpu_healthy(cpu_probe_env):
    out = diagnose.run_probe(timeout_s=240.0)
    assert out["status"] == "up", out
    assert out["platform"] == "cpu"
    assert out["n_devices"] >= 1
    assert out["roundtrip_ms"] > 0


def test_probe_bulk_bandwidth(cpu_probe_env):
    out = diagnose.run_probe(timeout_s=240.0, bulk_mb=1.0)
    assert out["status"] == "up", out
    assert out["bulk_fetch_mb"] == pytest.approx(1.0, rel=0.1)
    assert out["bulk_mb_per_s"] > 0


def test_probe_init_timeout_is_down_and_killed():
    # no INIT_OK within the init deadline -> killed (safe: no fetches)
    out = diagnose.run_probe(timeout_s=0.05)
    assert out["status"] == "down"
    assert "init" in out["error"] and "killed" in out["error"]


def test_probe_dispatch_hang_never_killed(cpu_probe_env, monkeypatch):
    # init succeeds, then the dispatch phase stalls (test hook): the parent
    # must report down WITHOUT killing the probe, and name its pid.
    monkeypatch.setenv("HPCD_DIAG_TEST_DISPATCH_SLEEP", "20")
    out = diagnose.run_probe(timeout_s=120.0, dispatch_timeout_s=0.5)
    assert out["status"] == "down"
    assert "LEFT RUNNING" in out["error"]
    pid = out["probe_pid"]
    # still alive after the verdict — run_probe did not kill it
    os.kill(pid, 0)
    # cleanup for the test only (a real axon probe must never be killed
    # mid-dispatch; this one is a CPU sleeper)
    os.kill(pid, 9)


def test_wait_aborts_on_inflight_probe(monkeypatch, capsys):
    # --wait must not stack new clients alongside an abandoned in-flight one
    monkeypatch.setattr(
        diagnose, "run_probe",
        lambda t, b=0.0, dispatch_timeout_s=900.0: {
            "status": "down", "probe_pid": 12345, "error": "LEFT RUNNING"})
    monkeypatch.setattr(diagnose, "lock_holder", lambda *a: None)
    monkeypatch.setattr(diagnose.time, "sleep", lambda s: None)
    assert diagnose.main(["--wait"]) == 2
    assert len([l for l in capsys.readouterr().out.splitlines() if l]) == 1


def test_main_refuses_on_live_lock_holder(monkeypatch, capsys):
    monkeypatch.setattr(diagnose, "lock_holder", lambda *a: 4242)
    probed = []
    monkeypatch.setattr(diagnose, "run_probe",
                        lambda *a, **k: probed.append(1) or {"status": "up",
                                                             "roundtrip_ms": 1.0})
    assert diagnose.main([]) == 3
    assert not probed
    line = json.loads(capsys.readouterr().out.strip())
    assert line["status"] == "refused" and line["chip_lock_holder"] == 4242
    # --force probes anyway
    assert diagnose.main(["--force"]) == 0
    assert probed


def test_lock_holder_live_stale_none(tmp_path):
    path = str(tmp_path / "lock")
    assert diagnose.lock_holder(path) is None
    with open(path, "w") as f:
        f.write(str(os.getpid()))
    assert diagnose.lock_holder(path) == os.getpid()
    p = subprocess.run([sys.executable, "-c", "import os; print(os.getpid())"],
                       capture_output=True, text=True)
    with open(path, "w") as f:
        f.write(p.stdout.strip())  # dead pid -> stale -> ignored
    assert diagnose.lock_holder(path) is None


def test_main_exit_codes(monkeypatch, capsys):
    calls = {"n": 0}

    monkeypatch.setattr(diagnose, "lock_holder", lambda *a: None)

    def fake_probe(timeout_s, bulk_mb=0.0, **kw):
        calls["n"] += 1
        return {"status": "up", "roundtrip_ms": 29.0, "platform": "tpu",
                "n_devices": 1, "init_s": 1.0}

    monkeypatch.setattr(diagnose, "run_probe", fake_probe)
    assert diagnose.main([]) == 0
    line = json.loads(capsys.readouterr().out.strip())
    assert line["status"] == "healthy"

    monkeypatch.setattr(
        diagnose, "run_probe",
        lambda t, bulk_mb=0.0, **kw: {"status": "up", "roundtrip_ms": 109000.0,
                                      "platform": "tpu", "n_devices": 1})
    assert diagnose.main([]) == 1  # degraded
    assert json.loads(capsys.readouterr().out.strip())["status"] == "degraded"

    monkeypatch.setattr(
        diagnose, "run_probe",
        lambda t, bulk_mb=0.0, **kw: {"status": "down", "error": "x"})
    assert diagnose.main([]) == 2


def test_main_wait_repolls_until_healthy(monkeypatch, capsys):
    monkeypatch.setattr(diagnose, "lock_holder", lambda *a: None)
    seq = [{"status": "down", "error": "boom"},
           {"status": "up", "roundtrip_ms": 30.0}]
    monkeypatch.setattr(diagnose, "run_probe",
                        lambda t, bulk_mb=0.0, **kw: seq.pop(0))
    monkeypatch.setattr(diagnose.time, "sleep", lambda s: None)
    assert diagnose.main(["--wait"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [x["status"] for x in lines] == ["down", "healthy"]


def test_module_alias_importable():
    import hyperpocket_tpu.diagnose as alias

    assert alias.main is diagnose.main
