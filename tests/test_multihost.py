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


def _spawn(worker: str, pid: int | None, *, port: str, n_procs: int = 2,
           devices_per_proc: int = 2):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if "axon" not in k.lower()}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices_per_proc}"
    env["PYTHONPATH"] = repo
    if pid is not None:
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(n_procs)
        env["JAX_PROCESS_ID"] = str(pid)
    return subprocess.Popen([sys.executable, "-c", worker % {"repo": repo}], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def test_two_process_distributed_init_and_reduce():
    procs = [_spawn(_WORKER, pid, port="12717") for pid in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "ok" in out


_TRAIN_WORKER = r'''
import sys
sys.path.insert(0, r"%(repo)s")
from hyperpocket_tpu.parallel.distributed import initialize_multihost
multi = initialize_multihost()
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from hyperpocket_tpu.models import FullModel
from hyperpocket_tpu.data.loader import BatchLoader
from hyperpocket_tpu.train.optim import make_optimizer
from hyperpocket_tpu.train.trainer import make_train_step

CFG = {
    "random_encoder": {"output_size": 8, "use_bias": True, "relu_slope": 0.2},
    "real_encoder": {"output_size": 8, "use_bias": True, "relu_slope": 0.2},
    "hyper_network": {"use_bias": True, "relu_slope": 0.2},
    "target_network": {"use_bias": True, "relu_slope": 0.2,
                       "freeze_layers_learning": False,
                       "layer_out_channels": [8, 16, 8]},
    "target_network_input": {"constant": False,
                             "normalization": {"enable": False,
                                               "type": "progressive", "epoch": 100}},
}
rng = np.random.default_rng(3)
items = []
for _ in range(8):
    items.append((
        (rng.standard_normal((32, 3)) * 0.3).astype(np.float32),
        (rng.standard_normal((32, 3)) * 0.3).astype(np.float32),
        (rng.standard_normal((64, 3)) * 0.3).astype(np.float32),
        "cat",
    ))
model = FullModel.from_config(CFG)
params = jax.device_get(model.init(jax.random.key(0)))
tx = make_optimizer({"type": "Adam", "hyperparams": {"lr": 1e-3}})
step = make_train_step(model, tx, 0.05)
if multi:
    assert jax.process_count() == 2, jax.process_count()
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    gparams = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(rep, np.asarray(a), np.shape(a)),
        params)
    opt_state = jax.jit(tx.init)(gparams)
    # each host loads only ITS slice of every global batch
    loader = BatchLoader(items, 8, shuffle=False, drop_last=True, num_workers=0,
                         process_shard=(jax.process_index(), 2))
    existing, missing, gt, _ = next(iter(loader))
    assert existing.shape[0] == 4, existing.shape
    def g(a):
        return jax.make_array_from_process_local_data(dat, a, (8,) + a.shape[1:])
    _, _, loss, *_ = step(gparams, opt_state, g(existing), g(missing), g(gt),
                          np.uint32(123), jnp.asarray(1.0), num_points=64)
else:
    loader = BatchLoader(items, 8, shuffle=False, drop_last=True, num_workers=0)
    existing, missing, gt, _ = next(iter(loader))
    opt_state = tx.init(params)
    _, _, loss, *_ = step(params, opt_state, jnp.asarray(existing),
                          jnp.asarray(missing), jnp.asarray(gt),
                          np.uint32(123), jnp.asarray(1.0), num_points=64)
print("LOSS %%.10e" %% float(loss))
'''


def test_two_process_sharded_train_step_matches_single():
    """The round-2 gap: loader process_shard + jax.distributed + the real
    jitted train step, composed. Two processes each load their half of the
    global batch, assemble global arrays, run ONE optimizer step; the loss
    must match a single-process run on the same global batch."""
    procs = [_spawn(_TRAIN_WORKER, pid, port="12719") for pid in range(2)]
    single = _spawn(_TRAIN_WORKER, None, port="0", devices_per_proc=1)
    outs = [p.communicate(timeout=900)[0] for p in procs]
    out_single = single.communicate(timeout=900)[0]
    losses = []
    for p, out in zip(procs + [single], outs + [out_single]):
        assert p.returncode == 0, out[-2000:]
        line = [ln for ln in out.splitlines() if ln.startswith("LOSS ")]
        assert line, out[-2000:]
        losses.append(float(line[-1].split()[1]))
    assert abs(losses[0] - losses[1]) <= 1e-7 * abs(losses[0]), losses
    assert abs(losses[0] - losses[2]) <= 2e-5 * abs(losses[2]), losses
