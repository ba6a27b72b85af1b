"""Single-client chip lock (utils/chip_lock.py).

The lock codifies the one-axon-client-at-a-time policy; these tests force
engagement (``force=True``) since the suite runs on the CPU backend where
the lock is deliberately a no-op.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading

import pytest

from hyperpocket_tpu.utils.chip_lock import (
    _pid_alive,
    _platform_is_chip,
    chip_lock,
)


def test_noop_on_cpu_backend(tmp_path):
    # conftest forces the cpu platform, so the lock must not engage: no
    # lockfile appears and nested use cannot deadlock.
    path = str(tmp_path / "lock")
    with chip_lock(path=path):
        with chip_lock(path=path):
            assert not os.path.exists(path)
    assert not _platform_is_chip()


def test_acquire_writes_pid_and_releases(tmp_path):
    path = str(tmp_path / "lock")
    with chip_lock(path=path, force=True):
        with open(path) as f:
            assert f.read().strip() == str(os.getpid())
    assert not os.path.exists(path)


def test_stale_lock_reclaimed(tmp_path):
    # A holder pid that is no longer alive must be reclaimed immediately.
    p = subprocess.run([sys.executable, "-c", "import os; print(os.getpid())"],
                       capture_output=True, text=True)
    dead_pid = int(p.stdout.strip())
    assert not _pid_alive(dead_pid)
    path = str(tmp_path / "lock")
    with open(path, "w") as f:
        f.write(str(dead_pid))
    with chip_lock(path=path, timeout_s=1.0, poll_s=0.05, force=True):
        with open(path) as f:
            assert f.read().strip() == str(os.getpid())
    assert not os.path.exists(path)


def test_garbage_lockfile_reclaimed(tmp_path):
    path = str(tmp_path / "lock")
    with open(path, "w") as f:
        f.write("not-a-pid")
    with chip_lock(path=path, timeout_s=1.0, poll_s=0.05, force=True):
        with open(path) as f:
            assert f.read().strip() == str(os.getpid())


def test_live_holder_times_out(tmp_path):
    # Our own pid is certainly alive: the lock must wait and then raise.
    path = str(tmp_path / "lock")
    with open(path, "w") as f:
        f.write(str(os.getpid()))
    with pytest.raises(TimeoutError, match="chip lock"):
        with chip_lock(path=path, timeout_s=0.3, poll_s=0.05, force=True):
            pass
    # The live holder's file is left untouched.
    with open(path) as f:
        assert f.read().strip() == str(os.getpid())


def test_contention_resolves_when_holder_exits(tmp_path):
    # A child process takes the lock and dies holding it (no __exit__); a
    # waiter blocked on the live holder must acquire once the pid goes
    # stale. NB an unreaped child is a zombie and still passes
    # ``os.kill(pid, 0)`` — the parent reaps it mid-wait, mirroring how a
    # shell runner reaps a crashed CLI training process.
    path = str(tmp_path / "lock")
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, time; sys.path.insert(0, '.');"
         "from hyperpocket_tpu.utils.chip_lock import chip_lock;"
         f"ctx = chip_lock(path={path!r}, force=True); ctx.__enter__();"
         "print('HELD', flush=True); time.sleep(1.0)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, text=True,
    )
    assert child.stdout.readline().strip() == "HELD"

    acquired = threading.Event()

    def waiter():
        with chip_lock(path=path, timeout_s=30.0, poll_s=0.05, force=True):
            acquired.set()

    t = threading.Thread(target=waiter)
    t.start()
    # While the child lives (and until reaped), the waiter must block.
    assert not acquired.wait(timeout=0.3)
    child.wait(timeout=10)  # reap: pid now truly stale
    assert acquired.wait(timeout=10.0)
    t.join(timeout=10)
    assert not os.path.exists(path)


def test_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("HPCD_CHIP_LOCK", "0")
    assert not _platform_is_chip()


def test_hpcd_platform_overrides_site_hook():
    # Site hooks that register a chip plugin can rewrite
    # ``jax.config.jax_platforms`` (axon's register() turns env ``cpu`` into
    # ``'axon,cpu'``), silently defeating JAX_PLATFORMS=cpu — observed live:
    # a "CPU" smoke became a chip client and queued on the chip lock for an
    # hour. HPCD_PLATFORM, honored at ``import hyperpocket_tpu``, must win
    # over such a pre-import rewrite.
    code = (
        "import jax;"
        "jax.config.update('jax_platforms', 'axon,cpu');"  # simulated hook
        "import hyperpocket_tpu;"
        "from hyperpocket_tpu.utils.chip_lock import _platform_is_chip;"
        "assert jax.config.jax_platforms == 'cpu', jax.config.jax_platforms;"
        "assert jax.default_backend() == 'cpu';"
        "assert not _platform_is_chip();"
        "print('OK')"
    )
    env = dict(os.environ, HPCD_PLATFORM="cpu")
    env.pop("JAX_PLATFORMS", None)
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert p.returncode == 0 and "OK" in p.stdout, p.stderr + p.stdout
