"""Test environment: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual 8-device CPU mesh (the driver's
dryrun_multichip uses the same mechanism). The environment may pre-initialize a
TPU backend at interpreter start (sitecustomize), so we clear backends and
re-point JAX at CPU here, before any test touches jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax._src.xla_bridge._clear_backends()
except Exception:
    pass
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()

# Persistent XLA compilation cache: the slow tier is compile-bound (the
# multi-dataset train e2e alone spent ~5 min of CPU-mesh compiles in round 2);
# cached executables make repeat runs of `-m slow` minutes faster.
_cache_dir = os.environ.get(
    "APE_XLA_CACHE", os.path.expanduser("~/.cache/ape_tpu_xla")
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
# persist even sub-second compiles: the slow tier is hundreds of small jits
# (1-core VM — every skipped recompile counts), not a few giant ones
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
