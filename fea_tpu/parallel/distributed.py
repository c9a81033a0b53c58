"""Multi-host (multi-process) runtime entry path.

The reference runs multi-node through HF Accelerate: ``accelerate
launch`` spawns one process per GPU, DDP all-reduces gradients over
NCCL, and every host-side effect — tqdm, checkpoint writes, sampling,
wandb — is gated on ``accelerator.is_main_process`` (reference
model/diffusion.py:456-458, 567-586, 613, 1000).

The TPU-native equivalent is the JAX multi-controller runtime: one
process per host, ``jax.distributed.initialize`` to form the cluster,
a hybrid DCN x ICI device mesh (`make_mesh(dcn_size=...)`,
parallel/mesh.py), and GSPMD inserting the cross-host collectives for
the dp-sharded batch axis. Gradient all-reduce then rides ICI within a
slice and DCN across slices with no user-visible communication code.

This container exposes one tunneled TPU chip, so real multi-host can
NOT run here; the path is exercised by unit tests with a mocked process
count (tests/test_distributed.py) and by the single-process no-op
branch every CLI run takes. On a real pod slice / multi-slice GKE
deployment, set the standard JAX cluster env (or rely on TPU metadata
auto-detection) and every CLI entry point picks it up via
``ensure_initialized()``.
"""

import os
from typing import Optional

import jax

_INITIALIZED = False
_MULTI = False


def ensure_initialized(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Idempotently join the JAX multi-controller cluster.

    Resolution order: explicit args > ``FEA_TPU_COORDINATOR`` /
    ``FEA_TPU_NUM_PROCESSES`` / ``FEA_TPU_PROCESS_ID`` env >
    ``jax.distributed.initialize()`` auto-detection when a cluster env
    (TPU pod metadata, SLURM, ...) is present. Single-process runs —
    everything in this container — take the no-op branch.

    Returns True if a multi-process runtime is (now) active.

    NOTE: on a real cluster this must run BEFORE anything touches the
    backend (jax.devices() & co) — the CLI calls it first thing. The
    single-process branch deliberately does NOT query the backend
    either (host-only CLI commands must not block on device init).
    """
    global _INITIALIZED, _MULTI
    if _INITIALIZED:
        return _MULTI

    coordinator_address = coordinator_address or os.environ.get(
        "FEA_TPU_COORDINATOR"
    )
    if num_processes is None and "FEA_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["FEA_TPU_NUM_PROCESSES"])
    if process_id is None and "FEA_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["FEA_TPU_PROCESS_ID"])

    auto_env = any(
        k in os.environ
        for k in (
            "COORDINATOR_ADDRESS",  # generic JAX clusters
            "SLURM_JOB_ID",
            "MEGASCALE_COORDINATOR_ADDRESS",  # multi-slice
            # TPU pod slices auto-detect via instance metadata, which
            # this code cannot probe cheaply — set FEA_TPU_MULTIHOST=1
            # on pod deployments to opt in to the no-args initialize()
            "FEA_TPU_MULTIHOST",
        )
    )
    if coordinator_address is None and not auto_env:
        _INITIALIZED = True  # single process: nothing to join, sticky
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    _MULTI = jax.process_count() > 1
    return _MULTI


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """Reference parity: ``accelerator.is_main_process``
    (diffusion.py:613) — gates checkpoint zips, sample/image writes,
    log files, wandb, and tqdm to exactly one host."""
    return jax.process_index() == 0


def sync_processes(name: str = "fea_tpu_barrier") -> None:
    """Cross-host barrier (the reference's
    ``accelerator.wait_for_everyone()``, diffusion.py:567). No-op on a
    single process."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
