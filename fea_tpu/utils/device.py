"""Device-placement policy helpers.

Rasterization work is tiny (a few MFLOP per image once the per-plate
pixel map exists) while the accelerator link may be a high-latency
tunnel; by default those kernels run on the host CPU backend so the
datagen loop only talks to the accelerator for FEM solves. Set
FEA_TPU_RASTER_DEVICE=accel to keep rasterization on the accelerator
(the right choice on directly-attached TPU hosts feeding a fused
device-resident pipeline)."""

import os
from typing import Optional

import jax

_cache_enabled = False


def enable_compilation_cache() -> None:
    """Persistent XLA compile cache (idempotent). Bucketed shapes mean a
    handful of kernels total; caching makes restarts and repeated runs
    cheap and sidesteps most remote-compile flakiness."""
    global _cache_enabled
    if _cache_enabled:
        return
    try:
        cache_dir = os.environ.get(
            "FEA_TPU_JAX_CACHE", os.path.expanduser("~/.cache/fea_tpu_jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _cache_enabled = True
    except Exception:
        pass


def raster_device() -> Optional[jax.Device]:
    """Device for raster/locate kernels; None = let JAX place them."""
    policy = os.environ.get("FEA_TPU_RASTER_DEVICE", "cpu")
    if policy == "accel":
        return None
    try:
        # local_devices, not devices: under a multi-process runtime
        # jax.devices() is the GLOBAL list and [0] can be another
        # process's (non-addressable) device — placing the raster kernel
        # there makes the result unfetchable (found by the real
        # 2-process run, benchmarks/multiprocess_smoke.py).
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None
