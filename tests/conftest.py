"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (a tunneled real TPU) and its
sitecustomize imports jax before we run, so the env var route is dead —
jax.config.update is the only way to retarget. Multi-chip sharding is
validated on fake CPU devices (xla_force_host_platform_device_count);
real-TPU benchmarking happens in bench.py, not in the test suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Float64 for FEM parity tests (TPU runs use f32 + refinement instead).
jax.config.update("jax_enable_x64", True)
