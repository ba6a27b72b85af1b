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


def test_probe_timeout_is_down():
    out = diagnose.run_probe(timeout_s=0.05)
    assert out["status"] == "down"
    assert "hung" in out["error"]


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

    def fake_probe(timeout_s, bulk_mb=0.0):
        calls["n"] += 1
        return {"status": "up", "roundtrip_ms": 29.0, "platform": "tpu",
                "n_devices": 1, "init_s": 1.0}

    monkeypatch.setattr(diagnose, "run_probe", fake_probe)
    assert diagnose.main([]) == 0
    line = json.loads(capsys.readouterr().out.strip())
    assert line["status"] == "healthy"

    monkeypatch.setattr(
        diagnose, "run_probe",
        lambda t, bulk_mb=0.0: {"status": "up", "roundtrip_ms": 109000.0,
                                "platform": "tpu", "n_devices": 1})
    assert diagnose.main([]) == 1  # degraded
    assert json.loads(capsys.readouterr().out.strip())["status"] == "degraded"

    monkeypatch.setattr(
        diagnose, "run_probe",
        lambda t, bulk_mb=0.0: {"status": "down", "error": "x"})
    assert diagnose.main([]) == 2


def test_main_wait_repolls_until_healthy(monkeypatch, capsys):
    seq = [{"status": "down", "error": "boom"},
           {"status": "up", "roundtrip_ms": 30.0}]
    monkeypatch.setattr(diagnose, "run_probe",
                        lambda t, bulk_mb=0.0: seq.pop(0))
    monkeypatch.setattr(diagnose.time, "sleep", lambda s: None)
    assert diagnose.main(["--wait"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [x["status"] for x in lines] == ["down", "healthy"]


def test_module_alias_importable():
    import hyperpocket_tpu.diagnose as alias

    assert alias.main is diagnose.main
