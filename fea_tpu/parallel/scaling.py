"""Multi-chip scaling efficiency measurement for the datagen surface.

The 8-device correctness of the sharded plate-group solve is established
by tests/test_datagen.py::test_solve_plate_group_sharded_over_mesh and
the driver's `dryrun_multichip`. This module measures its *efficiency*:
at FIXED total work (same plates, same conditions, same iteration
budget), how much more total device time does the dp-sharded program
spend than the single-device program?

On the virtual n-device CPU mesh every "device" shares the host cores,
so wall time ~= summed device time and

    efficiency = t_unsharded / t_sharded

directly exposes sharding overhead (plate-axis padding, partitioning,
collective scheduling) — 1.0 means the sharded program does no extra
work; real-chip speedup is then n_devices x efficiency assuming ICI
latency stays subdominant.

The sharded path is shard_map of the flat chunk body: each device
flattens and solves its own plates, so the program has NO cross-device
collectives at all (the earlier vmap-over-sharded-plates layout
all-reduced the CG while_loop condition every iteration and measured
0.52 efficiency at 0.6 s of work; shard_map removes that by
construction). Both runs use the flat kernel, so the ratio isolates
placement, not kernel choice.
"""

import os
import time
from typing import Dict

import numpy as np


def measure_sharding_efficiency(
    n_devices: int,
    plates_per_device: int = 1,
    conditions_per_plate: int = 2,
    mesh_size: float = 0.1,
    repeats: int = 2,
) -> Dict:
    """Returns {'t_unsharded_s', 't_sharded_s', 'efficiency',
    'lanes_per_device', ...}. Requires >= n_devices jax devices."""
    return _measure(
        n_devices, plates_per_device, conditions_per_plate, mesh_size,
        repeats,
    )


def _measure(
    n_devices: int,
    plates_per_device: int,
    conditions_per_plate: int,
    mesh_size: float,
    repeats: int,
) -> Dict:
    import jax

    from ..datagen.batched import PlateSolver, solve_plate_group
    from ..datagen.conditions import ConditionSampler
    from ..geometry import GeometrySampler
    from ..mesh import triangulate_polygon
    from .mesh import batch_sharding, make_mesh

    assert len(jax.devices()) >= n_devices

    from ..fem.problem import StaticProblem

    n_plates = n_devices * plates_per_device
    gs = GeometrySampler(random_seed=21)
    cs = ConditionSampler(random_seed=22)
    jobs = []
    while len(jobs) < n_plates:
        try:
            poly = gs.generate()
            mesh = triangulate_polygon(poly, mesh_size=mesh_size)
            conds = cs.sample(mesh, conditions_per_plate)
        except Exception:
            continue
        probs = [
            StaticProblem.from_condition(
                mesh,
                material_regions=c["material_regions"],
                point_constraints=c["point_constraints"],
                edge_constraints=c["edge_constraints"],
                point_forces=c["point_forces"],
                edge_forces=c["edge_forces"],
                num_steps=2,
            )
            for c in conds
        ]
        if any(p.structurally_singular() for p in probs):
            continue
        jobs.append((mesh, conds))

    node_b = max(
        PlateSolver(m, 2).node_bucket for m, _ in jobs
    )
    tri_b = max(PlateSolver(m, 2).tri_bucket for m, _ in jobs)
    payloads = []
    for mesh, conds in jobs:
        solver = PlateSolver(
            mesh, 2, node_bucket=node_b, tri_bucket=tri_b, band_hb=-1,
            include_cell_fields=False,
        )
        probs = [solver.build_problem(c) for c in conds]
        payloads.append((solver, probs))
    wmax = max(s.slots_dev.shape[1] for s, _ in payloads)
    payloads = [
        (
            PlateSolver(
                m, 2, node_bucket=node_b, tri_bucket=tri_b,
                min_incidence_degree=wmax, band_hb=-1,
                include_cell_fields=False,
            ),
            probs,
        )
        for (m, _), (s, probs) in zip(jobs, payloads)
    ]

    mesh_nd = make_mesh(n_devices)
    sharding = batch_sharding(mesh_nd)

    def timed(shard):
        best = float("inf")
        for _ in range(repeats + 1):  # first run compiles
            t0 = time.perf_counter()
            out = solve_plate_group(
                payloads, max_iters=600, sharding=shard,
                pad_group_to=n_plates,
            )
            dt = time.perf_counter() - t0
            best = min(best, dt)
        return best, out

    t_unsharded, out_u = timed(None)
    t_sharded, out_s = timed(sharding)

    # results must agree (same program, different placement)
    for pu, ps in zip(out_u, out_s):
        for ru, rs in zip(pu, ps):
            assert bool(ru.success) == bool(rs.success)
            if ru.success:
                np.testing.assert_allclose(
                    np.asarray(ru.displacements[-1]),
                    np.asarray(rs.displacements[-1]),
                    rtol=0, atol=1e-5,
                )

    return {
        "n_devices": n_devices,
        "plates": n_plates,
        "lanes_per_device": plates_per_device * conditions_per_plate,
        "t_unsharded_s": round(t_unsharded, 3),
        "t_sharded_s": round(t_sharded, 3),
        "efficiency": round(t_unsharded / t_sharded, 3),
    }


def measure_train_sharding_efficiency(
    n_devices: int,
    image_size: int = 32,
    per_device_batch: int = 2,
    input_dim: int = 16,
    repeats: int = 2,
) -> Dict:
    """DP train-step sharding efficiency, WEAK scaling.

    Companion to `measure_sharding_efficiency` for the training half:
    the jitted SPMD train step (grads psum-reduced across 'dp',
    reference train_model.py's Accelerate DDP) is timed on a 1-device
    mesh vs an n-device mesh with the SAME per-device batch (so n x the
    total work). On the virtual CPU mesh every device timeshares the
    host cores, so zero-overhead sharding means t_n ~= n * t_1 and

        efficiency = n * t_1 / t_n

    isolates the partition + collective overhead. Weak scaling is the
    honest design here: a fixed-total-batch comparison changes each
    device's conv batch shape, and XLA:CPU conv throughput is strongly
    batch-shape-dependent (measured 5x between batch 16 and batch 2
    programs on this host) — that artifact would swamp the sharding
    signal. Per-device programs here are shape-identical by
    construction.

    Uses a reduced-width FDN-UNet (input_dim 16) so the XLA:CPU compile
    stays minutes, not tens of minutes; the partition structure (conv
    spatial dims unsharded, batch dim sharded, params replicated) is
    identical to the flagship's."""
    import tempfile

    import jax

    from ..data.arrays import InMemoryFEADataset
    from ..train.trainer import Trainer, TrainerConfig

    assert len(jax.devices()) >= n_devices

    ds = InMemoryFEADataset.generate(
        num_plates=2, conditions_per_plate=2, num_steps=3,
        image_size=image_size, mesh_size=0.1, seed=13,
    )

    def step_time(nd: int) -> float:
        # effective batch (batch x accum) must stay >= 16 (trainer
        # parity assertion), so the accumulation depth absorbs what the
        # device count doesn't provide; per-device micro-batch shape is
        # per_device_batch in every configuration.
        accum = max(16 // (per_device_batch * nd), 1)
        cfg = TrainerConfig(
            dataset_image_size=image_size,
            train_batch_size=per_device_batch * nd,
            num_gradient_accumulation_steps=accum,
            num_train_steps=1,
            num_steps_per_condition=3,
            num_steps_per_sample_condition=3,
            input_dim=input_dim,
            n_devices=nd,
            skip_dataset_size_check=True,
            results_folder=tempfile.mkdtemp(prefix=f"train_scal_{nd}_"),
            progress_bar=False,
        )
        tr = Trainer(cfg, dataset=ds, sample_dataset=ds)
        batch_data = tr._fetch_batch(0)
        state = tr.state
        state, _ = tr._train_step(state, batch_data)  # compile
        jax.block_until_ready(state.params)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            state, _ = tr._train_step(state, batch_data)
            jax.block_until_ready(state.params)
            best = min(best, time.perf_counter() - t0)
        # normalize to equal accumulation depth: the 1-device config
        # runs a deeper accum scan to satisfy the >=16 effective batch
        return best / accum

    t_1 = step_time(1)
    t_n = step_time(n_devices)
    return {
        "n_devices": n_devices,
        "per_device_batch": per_device_batch,
        "image_size": image_size,
        "t_1dev_s_per_accum": round(t_1, 4),
        "t_ndev_s_per_accum": round(t_n, 4),
        "efficiency": round(n_devices * t_1 / t_n, 3),
    }
