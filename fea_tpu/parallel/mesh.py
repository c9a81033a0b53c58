"""Device-mesh + sharding helpers.

The reference delegated distribution to HF Accelerate's DDP wrapper
(diffusion.py:456-458, 567-586) — gradient all-reduce over NCCL with
host-side barriers. The TPU-native equivalent is a single jax.Array
program: a 1-D 'dp' mesh over ICI, batches sharded along 'dp', params
replicated; XLA inserts the gradient psum during jit compilation. No
user-visible collectives, no barriers.

The model here is small (1e7-1e8 params, images <= 512^2), so data
parallelism is the only distribution the workload needs (SURVEY.md §2,
"Parallelism strategies"); the mesh helper still accepts extra axes so
larger variants can shard parameters ('tp') without API changes.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)
) -> Mesh:
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    devices = np.asarray(devices[:n])
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # fold extra axes as size-1 unless the caller reshapes explicitly
        shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, leading_unsharded: int = 0) -> NamedSharding:
    """Shard a batch along 'dp'. `leading_unsharded` skips leading axes
    (e.g. the gradient-accumulation axis)."""
    spec = P(*([None] * leading_unsharded + ["dp"]))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, leading_unsharded: int = 0):
    sharding = batch_sharding(mesh, leading_unsharded)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
