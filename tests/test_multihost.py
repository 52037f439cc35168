"""Two-process multi-host smoke (VERDICT item 10): jax.distributed.initialize
over a localhost coordinator, global mesh spanning both processes, per-host
batch shards assembled with make_array_from_process_local_data, and a global
reduction whose result every process agrees on."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax._src.xla_bridge._clear_backends()
except Exception:
    pass
pid = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address="localhost:%PORT%", num_processes=2, process_id=pid,
    local_device_ids=[0, 1],
)
sys.path.insert(0, %REPO%)
import numpy as np
import jax.numpy as jnp
from ape_tpu.parallel.mesh import (
    batch_sharding, is_main_process, local_batch_slice, make_mesh, shard_batch,
)

assert jax.process_count() == 2 and jax.device_count() == 4
assert is_main_process() == (pid == 0)
mesh = make_mesh()
GLOBAL = np.arange(8, dtype=np.float32).reshape(8, 1) + 1.0
sl = local_batch_slice(8)
assert (sl.stop - sl.start) == 4
batch = {"x": GLOBAL[sl]}
sharded = shard_batch(mesh, batch)
total = jax.jit(lambda b: jnp.sum(b["x"]))(sharded)
expected = float(GLOBAL.sum())
got = float(total)
assert abs(got - expected) < 1e-6, (got, expected)
print(f"proc {pid}: global sum {got} OK", flush=True)
"""


def test_two_process_cpu_mesh(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.join(os.path.dirname(__file__), "..")
    code = _WORKER.replace("%PORT%", str(port)).replace("%REPO%", repr(repo))
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK" in out
