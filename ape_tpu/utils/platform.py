"""Platform forcing helper.

The hosting environment may pre-initialize a TPU backend at interpreter start
and re-export JAX_PLATFORMS, so env vars alone cannot select CPU; this re-points
JAX after the fact (same mechanism as tests/conftest.py)."""

from __future__ import annotations

import os


def force_platform(platform: str, n_devices: int = 1):
    import jax

    # never call jax.default_backend() before re-pointing: it initializes the
    # backend and re-pointing only works on an uninitialized registry
    initialized = bool(getattr(jax._src.xla_bridge, "_backends", {}))
    if initialized and jax.default_backend() == platform and len(jax.devices()) >= n_devices:
        return
    os.environ["JAX_PLATFORMS"] = platform
    if platform == "cpu" and n_devices > 1:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    jax.config.update("jax_platforms", platform)
    try:
        jax._src.xla_bridge._clear_backends()
    except Exception:
        pass
    assert jax.default_backend() == platform, jax.default_backend()
