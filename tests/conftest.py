"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are exercised on a simulated 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`), standing in for a TPU pod slice
— the reference has no tests at all (SURVEY.md §4), so this pyramid is ours.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The machine's sitecustomize may have imported jax already (axon TPU
# plugin), baking JAX_PLATFORMS from the shell env; override via config,
# which takes effect as long as no backend has been initialised yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, (
    "tests require the simulated 8-device CPU mesh; got "
    f"{jax.devices()} — check XLA_FLAGS/JAX_PLATFORMS handling in conftest"
)
