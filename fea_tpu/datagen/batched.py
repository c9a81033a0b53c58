"""Device-resident plate solving: upload the padded mesh scaffold once per
plate, dispatch per-condition solves asynchronously, fetch packed results.

This is the throughput core of datagen: the reference pays a fresh sfepy
problem build + SuperLU factorization per condition per step
(fea_analysis.py:418-461); here a plate's mesh lives on device and each
condition is one async packed PCG solve (~100 KB of traffic round trip).
`generate_data_batched` additionally groups same-bucket plates and vmaps
the solve across them — the multi-plate scale-out surface for larger
meshes of devices.
"""

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from ..fem.assembly import build_incidence
from ..fem.problem import (
    SolveResult,
    StaticProblem,
    _solve_kernel_packed,
    _solve_core,
    unpack_solve,
)
from ..mesh import Mesh
from .pipeline import next_bucket


@partial(
    jax.jit,
    static_argnames=(
        "tol", "max_iters", "accept_tol", "restarts", "include_cell_fields",
    ),
)
def _solve_batch_kernel(
    coords,
    triangles,
    incidence_slots,
    young_b,
    poisson_b,
    free_b,
    loads_b,
    *,
    tol: float,
    max_iters: int,
    accept_tol: float,
    restarts: int,
    include_cell_fields: bool = True,
):
    """vmap of the packed solve over conditions sharing one mesh scaffold.
    One dispatch + one fetch for a whole batch of conditions (or plates of
    the same bucket when the mesh args are batched too)."""

    def single(young, poisson, free, loads):
        res, eps1, sig1 = _solve_core(
            coords, triangles, young, poisson, incidence_slots, free, loads,
            tol, max_iters, accept_tol, restarts,
        )
        f32 = jnp.float32
        parts = [res.x.reshape(-1).astype(f32)]
        if include_cell_fields:
            parts += [
                eps1.reshape(-1).astype(f32), sig1.reshape(-1).astype(f32)
            ]
        parts.append(
            jnp.stack(
                [
                    res.converged.astype(f32),
                    res.failed.astype(f32),
                    res.residual_norm.astype(f32),
                    res.iterations.astype(f32),
                ]
            )
        )
        return jnp.concatenate(parts)

    return jax.vmap(single)(young_b, poisson_b, free_b, loads_b)


def _failed_result(num_steps: int, n: int, m: int) -> SolveResult:
    zeros_u = np.zeros((num_steps, n, 2))
    zeros_c = np.zeros((num_steps, m, 3))
    return SolveResult(
        displacements=zeros_u,
        strain=zeros_c,
        stress=zeros_c,
        converged=np.asarray(False),
        failed=np.asarray(True),
        residual_norm=np.asarray(np.inf),
        iterations=np.asarray(0),
    )


@partial(
    jax.jit,
    static_argnames=(
        "tol", "max_iters", "accept_tol", "restarts", "include_cell_fields",
    ),
)
def _solve_multi_plate_kernel(
    coords_p,  # (P, Nb, 2)
    triangles_p,  # (P, Mb, 3)
    slots_p,  # (P, 2*Nb, W)
    young_pc,  # (P, C, Mb)
    poisson_pc,
    free_pc,  # (P, C, Nb)
    loads_pc,  # (P, C, Nb, 2)
    *,
    tol: float,
    max_iters: int,
    accept_tol: float,
    restarts: int,
    include_cell_fields: bool = True,
):
    """Two-level vmap: plates (distinct meshes, same bucket) x conditions.
    One dispatch + one fetch for a whole group of plates — the multi-chip
    scale-out surface (shard the plate axis over a 'dp' mesh and XLA runs
    each device's plates independently)."""

    def single(coords, triangles, slots, young, poisson, free, loads):
        res, eps1, sig1 = _solve_core(
            coords, triangles, young, poisson, slots, free, loads,
            tol, max_iters, accept_tol, restarts,
        )
        f32 = jnp.float32
        parts = [res.x.reshape(-1).astype(f32)]
        if include_cell_fields:
            parts += [
                eps1.reshape(-1).astype(f32), sig1.reshape(-1).astype(f32)
            ]
        parts.append(
            jnp.stack(
                [
                    res.converged.astype(f32),
                    res.failed.astype(f32),
                    res.residual_norm.astype(f32),
                    res.iterations.astype(f32),
                ]
            )
        )
        return jnp.concatenate(parts)

    inner = jax.vmap(single, in_axes=(None, None, None, 0, 0, 0, 0))
    outer = jax.vmap(inner, in_axes=(0, 0, 0, 0, 0, 0, 0))
    return outer(
        coords_p, triangles_p, slots_p, young_pc, poisson_pc, free_pc, loads_pc
    )


class PlateSolver:
    """Per-plate solver with device-resident padded mesh scaffold."""

    def __init__(
        self,
        mesh: Mesh,
        num_steps: int,
        dtype=jnp.float32,
        tol: Optional[float] = None,
        max_iters: int = 6000,
        accept_tol: float = 1e-4,
        restarts: Optional[int] = None,
        include_cell_fields: bool = True,
        node_bucket: Optional[int] = None,
        tri_bucket: Optional[int] = None,
        min_incidence_degree: int = 0,
    ):
        """`node_bucket`/`tri_bucket`/`min_incidence_degree` force the padded
        shapes (bumped up if the mesh doesn't fit) so a group of plates can
        share ONE compiled kernel — and hence one dispatch + one fetch."""
        self.mesh = mesh
        self.num_steps = num_steps
        self.n = mesh.num_nodes
        self.m = mesh.num_triangles
        self.node_bucket = max(node_bucket or 0, next_bucket(self.n + 3))
        self.tri_bucket = max(tri_bucket or 0, next_bucket(self.m))
        self._min_incidence_degree = min_incidence_degree
        self.dtype = jnp.dtype(dtype)
        if self.dtype == jnp.float64 and not jax.config.jax_enable_x64:
            self.dtype = jnp.dtype(jnp.float32)
        self.tol = tol if tol is not None else (
            1e-10 if self.dtype == jnp.float64 else 1e-6
        )
        self.max_iters = max_iters
        self.accept_tol = accept_tol
        self.restarts = restarts if restarts is not None else (
            1 if self.dtype == jnp.float64 else 6
        )
        self.include_cell_fields = include_cell_fields

        # Build the padded scaffold once from a dummy condition.
        scaffold = StaticProblem(
            coords=np.asarray(mesh.coords),
            triangles=np.asarray(mesh.triangles),
            young=np.zeros(self.m),
            poisson=np.zeros(self.m),
            fixed_nodes=np.zeros(self.n, dtype=bool),
            loads=np.zeros((self.n, 2)),
            num_steps=num_steps,
        ).padded(self.node_bucket, self.tri_bucket)
        self._padded_triangles = scaffold.triangles
        self._pad_fixed_tail = scaffold.fixed_nodes[self.n :]
        incidence = build_incidence(
            scaffold.triangles,
            self.node_bucket,
            pad_degree=self._min_incidence_degree,
        )
        self.coords_dev = jnp.asarray(scaffold.coords, self.dtype)
        self.triangles_dev = jnp.asarray(scaffold.triangles, jnp.int32)
        self.slots_dev = incidence.slots

    def build_problem(self, condition: Dict) -> StaticProblem:
        return StaticProblem.from_condition(
            self.mesh,
            material_regions=condition["material_regions"],
            point_constraints=condition["point_constraints"],
            edge_constraints=condition["edge_constraints"],
            point_forces=condition["point_forces"],
            edge_forces=condition["edge_forces"],
            num_steps=self.num_steps,
        )

    def dispatch(self, problem: StaticProblem):
        """Async dispatch; returns a device array (the packed result)."""
        pad_m = self.tri_bucket - self.m
        young = np.concatenate([problem.young, np.zeros(pad_m)])
        poisson = np.concatenate([problem.poisson, np.zeros(pad_m)])
        free = ~np.concatenate([problem.fixed_nodes, self._pad_fixed_tail])
        loads = np.concatenate(
            [problem.loads, np.zeros((self.node_bucket - self.n, 2))]
        )
        return _solve_kernel_packed(
            self.coords_dev,
            self.triangles_dev,
            jnp.asarray(young, self.dtype),
            jnp.asarray(poisson, self.dtype),
            self.slots_dev,
            jnp.asarray(free, self.dtype),
            jnp.asarray(loads, self.dtype),
            tol=self.tol,
            max_iters=self.max_iters,
            accept_tol=self.accept_tol,
            restarts=self.restarts,
            include_cell_fields=self.include_cell_fields,
        )

    def fetch(self, token) -> SolveResult:
        packed = np.asarray(token)  # single round trip
        result = unpack_solve(
            packed, self.node_bucket, self.tri_bucket, self.num_steps
        )
        return result._replace(
            displacements=result.displacements[:, : self.n],
            strain=result.strain[:, : self.m],
            stress=result.stress[:, : self.m],
        )

    def _pad_condition_arrays(self, problem: StaticProblem):
        pad_m = self.tri_bucket - self.m
        young = np.concatenate([problem.young, np.zeros(pad_m)])
        poisson = np.concatenate([problem.poisson, np.zeros(pad_m)])
        free = ~np.concatenate([problem.fixed_nodes, self._pad_fixed_tail])
        loads = np.concatenate(
            [problem.loads, np.zeros((self.node_bucket - self.n, 2))]
        )
        return young, poisson, free.astype(np.float32), loads

    def dispatch_batch(self, problems: List[StaticProblem]):
        """One dispatch for a batch of conditions on this plate's mesh."""
        arrays = [self._pad_condition_arrays(p) for p in problems]
        young_b = jnp.asarray(np.stack([a[0] for a in arrays]), self.dtype)
        poisson_b = jnp.asarray(np.stack([a[1] for a in arrays]), self.dtype)
        free_b = jnp.asarray(np.stack([a[2] for a in arrays]), self.dtype)
        loads_b = jnp.asarray(np.stack([a[3] for a in arrays]), self.dtype)
        return _solve_batch_kernel(
            self.coords_dev,
            self.triangles_dev,
            self.slots_dev,
            young_b,
            poisson_b,
            free_b,
            loads_b,
            tol=self.tol,
            max_iters=self.max_iters,
            accept_tol=self.accept_tol,
            restarts=self.restarts,
            include_cell_fields=self.include_cell_fields,
        )

    def fetch_batch(self, token) -> List[SolveResult]:
        packed_b = np.asarray(token)  # ONE round trip for the whole batch
        out = []
        for packed in packed_b:
            result = unpack_solve(
                packed, self.node_bucket, self.tri_bucket, self.num_steps
            )
            out.append(
                result._replace(
                    displacements=result.displacements[:, : self.n],
                    strain=result.strain[:, : self.m],
                    stress=result.stress[:, : self.m],
                )
            )
        return out

    def failed_result(self) -> SolveResult:
        return _failed_result(self.num_steps, self.n, self.m)

    @property
    def shape_key(self):
        return (self.node_bucket, self.tri_bucket, int(self.slots_dev.shape[1]))


def dispatch_plate_group(
    payloads,
    tol=None,
    max_iters: int = 6000,
    sharding=None,
    pad_group_to: int = 0,
):
    """Async half of `solve_plate_group`: stack + upload a group of
    same-bucket plates, dispatch the two-level vmapped kernel, and return
    the device token immediately (the host is free to prep the next chunk
    while the solves run)."""
    n_real = len(payloads)
    if pad_group_to > n_real:
        payloads = payloads + [payloads[-1]] * (pad_group_to - n_real)
    solver0 = payloads[0][0]
    for s, _ in payloads:
        assert s.shape_key == solver0.shape_key

    coords_p = jnp.stack([s.coords_dev for s, _ in payloads])
    tris_p = jnp.stack([s.triangles_dev for s, _ in payloads])
    slots_p = jnp.stack([s.slots_dev for s, _ in payloads])

    young, poisson, free, loads = [], [], [], []
    for s, problems in payloads:
        arrays = [s._pad_condition_arrays(p) for p in problems]
        young.append(np.stack([a[0] for a in arrays]))
        poisson.append(np.stack([a[1] for a in arrays]))
        free.append(np.stack([a[2] for a in arrays]))
        loads.append(np.stack([a[3] for a in arrays]))
    dtype = solver0.dtype
    args = [
        coords_p,
        tris_p,
        slots_p,
        jnp.asarray(np.stack(young), dtype),
        jnp.asarray(np.stack(poisson), dtype),
        jnp.asarray(np.stack(free), dtype),
        jnp.asarray(np.stack(loads), dtype),
    ]
    if sharding is not None:
        args = [jax.device_put(a, sharding) for a in args]

    return _solve_multi_plate_kernel(
        *args,
        tol=solver0.tol if tol is None else tol,
        max_iters=max_iters,
        accept_tol=solver0.accept_tol,
        restarts=solver0.restarts,
        include_cell_fields=solver0.include_cell_fields,
    )


def fetch_plate_group(token, payloads):
    """Blocking half of `solve_plate_group`: ONE round trip for the whole
    group, then unpack per plate/condition."""
    packed = np.asarray(token)
    out = []
    for (s, problems), packed_plate in zip(payloads, packed):
        results = []
        for packed_cond in packed_plate[: len(problems)]:
            r = unpack_solve(
                packed_cond, s.node_bucket, s.tri_bucket, s.num_steps
            )
            results.append(
                r._replace(
                    displacements=r.displacements[:, : s.n],
                    strain=r.strain[:, : s.m],
                    stress=r.stress[:, : s.m],
                )
            )
        out.append(results)
    return out


def solve_plate_group(
    payloads,
    tol=None,
    max_iters: int = 6000,
    sharding=None,
    pad_group_to: int = 0,
):
    """Solve all conditions of a group of same-bucket plates in ONE
    dispatch + ONE fetch.

    payloads: list of (PlateSolver, [StaticProblem, ...]) with equal
    shape_key and equal condition counts. Optional `sharding`: a
    jax.sharding.NamedSharding to distribute the plate axis over a device
    mesh. `pad_group_to` repeats the last payload so every group compiles
    at one fixed plate count. Returns list-of-lists of SolveResult
    matching the (unpadded) input."""
    token = dispatch_plate_group(
        payloads,
        tol=tol,
        max_iters=max_iters,
        sharding=sharding,
        pad_group_to=pad_group_to,
    )
    return fetch_plate_group(token, payloads)


class RunningBuckets:
    """Monotone bucket policy: every plate is padded up to the largest
    bucket seen so far in the run, so shapes (and compiled kernels, and
    grouped dispatches) stabilize after the first few plates instead of
    splintering into one shape key per plate. Scales with the actual mesh
    sizes — tiny test meshes stay tiny."""

    def __init__(self):
        self.node = 0
        self.tri = 0
        self.degree = 0

    def update(self, meshes) -> None:
        for mesh in meshes:
            self.node = max(self.node, next_bucket(mesh.num_nodes + 3))
            self.tri = max(self.tri, next_bucket(mesh.num_triangles))

    def update_degree(self, solvers) -> None:
        for s in solvers:
            self.degree = max(self.degree, int(s.slots_dev.shape[1]))


def generate_data_batched(
    data_dir: str = "data/",
    image_size: int = 512,
    num_plates: int = 8,
    conditions_per_plate: int = 4,
    mesh_size: float = 1e-2,
    num_polygons_range=(1, 3),
    points_per_polygon_range=(3, 8),
    holes_per_polygon_range=(0, 3),
    points_per_hole_range=(3, 4),
    num_regions=(1, 5),
    save_displacement: bool = True,
    save_strain: bool = False,
    save_stress: bool = False,
    num_steps_per_condition: int = 11,
    save_meshes: bool = False,
    seed=None,
    batch_size: int = 4,
    max_condition_retries: int = 30,
    verbose: bool = True,
) -> Dict:
    """Multi-plate batched datagen (BASELINE config 3 — 'batched datagen').

    `batch_size` defaults to 4: the group solve is one long-running vmapped
    while_loop, and every lane runs until the SLOWEST lane finishes, so
    very large groups pay a lockstep tax — and on tunneled devices a
    multi-minute kernel can trip the remote watchdog. 4 plates x 4
    conditions = 16 lanes is the sweet spot measured on v5e.

    Built for high-latency device links: a chunk of `batch_size` plates is
    padded to shared (monotone running-max) buckets so ALL of its solves run
    as ONE device program — one dispatch + one packed fetch per chunk,
    instead of one per plate. The loop is software-pipelined: while chunk
    k's solves are in flight, the host preps chunk k+1 (meshing,
    clustering, condition checks) and builds chunk k's pixel maps."""
    import os
    from timeit import default_timer as timer

    from ..geometry import GeometryError, GeometrySampler
    from ..mesh import MeshError, triangulate_polygon
    from ..raster import build_pixel_map, geometry_image, outline_image
    from ..utils.device import enable_compilation_cache
    from .conditions import ConditionSampler
    from .pipeline import _write_condition
    from .writers import save_gray_png, verify_directory

    enable_compilation_cache()
    verify_directory(data_dir)
    geometry_sampler = GeometrySampler(
        num_polygons_range=num_polygons_range,
        points_per_polygon_range=points_per_polygon_range,
        holes_per_polygon_range=holes_per_polygon_range,
        points_per_hole_range=points_per_hole_range,
        random_seed=seed,
    )
    condition_sampler = ConditionSampler(
        num_regions_range=num_regions,
        random_seed=None if seed is None else seed + 1,
    )
    include_cell_fields = save_strain or save_stress or save_meshes
    buckets = RunningBuckets()

    stats = {"plates": 0, "solves": 0, "failures": 0, "total_solve_time": 0.0}

    def nonsingular_pairs(mesh):
        """(condition, problem) pairs for one plate, resampling past
        structurally singular draws; None to redraw the plate."""
        conditions = condition_sampler.sample(mesh, conditions_per_plate)
        pairs = []
        retries = 0
        for condition in conditions:
            while True:
                problem = StaticProblem.from_condition(
                    mesh,
                    material_regions=condition["material_regions"],
                    point_constraints=condition["point_constraints"],
                    edge_constraints=condition["edge_constraints"],
                    point_forces=condition["point_forces"],
                    edge_forces=condition["edge_forces"],
                    num_steps=num_steps_per_condition,
                )
                if not problem.structurally_singular():
                    pairs.append((condition, problem))
                    break
                stats["solves"] += 1
                stats["failures"] += 1
                retries += 1
                if retries > max_condition_retries:
                    return None
                condition = condition_sampler.sample_one(mesh)
        return pairs

    def prep_chunk(chunk: int):
        """Host prep of `chunk` plates: geometry -> mesh -> conditions."""
        plates = []  # (mesh, pairs)
        while len(plates) < chunk:
            try:
                polygon = geometry_sampler.generate()
                mesh = triangulate_polygon(polygon, mesh_size=mesh_size)
            except (GeometryError, MeshError):
                continue
            pairs = nonsingular_pairs(mesh)
            if pairs is None:
                continue  # redraw plate
            plates.append((mesh, pairs))
        return plates

    def dispatch_chunk(plates):
        """Pad the chunk to shared buckets and dispatch every solve as one
        device program per (rarely >1) shape group. Returns [(payloads,
        solvers-aligned entries, token), ...] without blocking."""
        buckets.update(m for m, _ in plates)
        solvers = [
            PlateSolver(
                mesh,
                num_steps_per_condition,
                node_bucket=buckets.node,
                tri_bucket=buckets.tri,
                min_incidence_degree=buckets.degree,
                include_cell_fields=include_cell_fields,
            )
            for mesh, _ in plates
        ]
        buckets.update_degree(solvers)
        groups: Dict = {}
        for solver, (mesh, pairs) in zip(solvers, plates):
            groups.setdefault(solver.shape_key, []).append(
                (mesh, solver, pairs)
            )
        dispatched = []
        for entries in groups.values():
            payloads = [
                (solver, [p for _, p in pairs])
                for _, solver, pairs in entries
            ]
            pad_to = len(payloads)
            for candidate in (1, 2, 4, batch_size):
                if candidate >= pad_to:
                    pad_to = candidate
                    break
            token = dispatch_plate_group(payloads, pad_group_to=pad_to)
            dispatched.append((payloads, entries, token))
        return dispatched

    plate_index = 0
    next_plates = prep_chunk(min(batch_size, num_plates))
    while plate_index < num_plates:
        plates = next_plates
        t0 = timer()
        dispatched = dispatch_chunk(plates)  # async — solves in flight

        # ---- overlap the in-flight solves with host work ----------------
        remaining = num_plates - plate_index - len(plates)
        next_plates = prep_chunk(min(batch_size, remaining)) if remaining else None
        pixel_maps = {
            id(mesh): build_pixel_map(
                mesh.coords,
                mesh.triangles,
                image_size,
                pad_candidates=32,
                pad_shapes=(buckets.node, buckets.tri),
            )
            for mesh, _ in plates
        }

        # ---- fetch: one round trip per group -----------------------------
        chunk_results = []  # (mesh, solver, pairs, results) in plate order
        by_mesh = {}
        for payloads, entries, token in dispatched:
            solved = fetch_plate_group(token, payloads)
            for (mesh, solver, pairs), results in zip(entries, solved):
                by_mesh[id(mesh)] = (mesh, solver, pairs, results)
        for mesh, _ in plates:
            chunk_results.append(by_mesh[id(mesh)])
        stats["total_solve_time"] += timer() - t0
        stats["solves"] += sum(len(pairs) for _, pairs in plates)

        # ---- failures: resample + single-plate batch retries -------------
        for mesh, solver, pairs, results in chunk_results:
            retries = 0
            while any(not r.success for r in results):
                retry_idx = [i for i, r in enumerate(results) if not r.success]
                stats["failures"] += len(retry_idx)
                retries += len(retry_idx)
                if retries > max_condition_retries:
                    break
                new_pairs = []
                for i in retry_idx:
                    while True:
                        condition = condition_sampler.sample_one(mesh)
                        problem = solver.build_problem(condition)
                        if not problem.structurally_singular():
                            break
                        stats["failures"] += 1
                        retries += 1
                    pairs[i] = (condition, problem)
                    new_pairs.append(problem)
                t0 = timer()
                token = solver.dispatch_batch(
                    new_pairs + [new_pairs[-1]]
                    * (conditions_per_plate - len(new_pairs))
                )
                retry_results = solver.fetch_batch(token)[: len(new_pairs)]
                stats["total_solve_time"] += timer() - t0
                stats["solves"] += len(new_pairs)
                for i, r in zip(retry_idx, retry_results):
                    results[i] = r

            # ---- write ----------------------------------------------------
            if any(not r.success for r in results):
                if verbose:
                    print(f"abandoning plate {plate_index + 1} (unsatisfiable)")
                plate_index += 1
                continue
            pixel_map = pixel_maps[id(mesh)]
            plate_dir = os.path.join(data_dir, str(plate_index + 1))
            verify_directory(plate_dir)
            save_gray_png(
                os.path.join(plate_dir, "outline.png"),
                outline_image(pixel_map, mesh.coords, mesh.ring_corner_ids),
            )
            save_gray_png(
                os.path.join(plate_dir, "input.png"), geometry_image(pixel_map)
            )
            for slot, ((condition, _), result) in enumerate(zip(pairs, results)):
                condition_dir = os.path.join(plate_dir, str(slot + 1))
                verify_directory(condition_dir)
                _write_condition(
                    mesh,
                    pixel_map,
                    condition,
                    result,
                    condition_dir,
                    num_steps_per_condition,
                    save_displacement,
                    save_strain,
                    save_stress,
                    save_meshes,
                )
            stats["plates"] += 1
            plate_index += 1
        if verbose:
            print(
                f"chunk done: {stats['plates']} plates, "
                f"solve time {stats['total_solve_time']:.1f}s"
            )
    return stats
