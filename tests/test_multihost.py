"""Two-process jax.distributed rehearsal: the CPU stand-in for multi-host DCN.

Spawns two fresh processes (2 virtual CPU devices each), initialises the
process group through parallel/distributed.initialize_multihost (env-var
driven), assembles a global array from per-host shards and checks a
cross-process reduction — the machinery a multi-host pod run would use.
"""

import os
import subprocess
import sys

_WORKER = r'''
import sys
sys.path.insert(0, r"%(repo)s")
from hyperpocket_tpu.parallel.distributed import initialize_multihost, local_batch_slice
ok = initialize_multihost()
import jax
import jax.numpy as jnp
import numpy as np
assert ok and jax.process_count() == 2, (ok, jax.process_count())
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
sl = local_batch_slice(8)
assert sl == slice(jax.process_index() * 4, jax.process_index() * 4 + 4), sl
local = jnp.full((2, 3), float(jax.process_index() + 1))
garr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), local, (4, 3))
total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(garr)
assert abs(float(total) - 18.0) < 1e-6, float(total)
print("ok", jax.process_index())
'''


def test_two_process_distributed_init_and_reduce():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = _WORKER % {"repo": repo}
    base = {k: v for k, v in os.environ.items() if "axon" not in k.lower()}
    base["JAX_PLATFORMS"] = "cpu"
    base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = []
    for pid in range(2):
        env = dict(base)
        env["PYTHONPATH"] = repo
        env["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:12717"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen([sys.executable, "-c", worker], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "ok" in out
