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
    ):
        self.mesh = mesh
        self.num_steps = num_steps
        self.n = mesh.num_nodes
        self.m = mesh.num_triangles
        self.node_bucket = next_bucket(self.n + 3)
        self.tri_bucket = next_bucket(self.m)
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
        incidence = build_incidence(scaffold.triangles, self.node_bucket)
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

    token = _solve_multi_plate_kernel(
        *args,
        tol=solver0.tol if tol is None else tol,
        max_iters=max_iters,
        accept_tol=solver0.accept_tol,
        restarts=solver0.restarts,
        include_cell_fields=solver0.include_cell_fields,
    )
    packed = np.asarray(token)  # ONE round trip for the whole group
    out = []
    for (s, problems), packed_plate in zip(payloads[:n_real], packed[:n_real]):
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
    batch_size: int = 8,
    max_condition_retries: int = 30,
    verbose: bool = True,
) -> Dict:
    """Multi-plate batched datagen: prepare `batch_size` plates on the
    host, group them by compiled shape, and run each group's solves as a
    single device program (BASELINE config 3 — 'batched datagen')."""
    from timeit import default_timer as timer

    from ..geometry import GeometryError, GeometrySampler
    from ..mesh import MeshError, triangulate_polygon
    from ..raster import build_pixel_map
    from ..utils.device import enable_compilation_cache
    from .conditions import ConditionSampler
    from .pipeline import _write_condition
    from .writers import verify_directory

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

    stats = {"plates": 0, "solves": 0, "failures": 0, "total_solve_time": 0.0}
    plate_index = 0
    while plate_index < num_plates:
        chunk = min(batch_size, num_plates - plate_index)
        # ---- host prep: meshes + non-singular conditions ---------------
        payloads = []  # (plate_no, mesh, solver, [(condition, problem)])
        while len(payloads) < chunk:
            try:
                polygon = geometry_sampler.generate()
                mesh = triangulate_polygon(polygon, mesh_size=mesh_size)
            except (GeometryError, MeshError):
                continue
            solver = PlateSolver(mesh, num_steps_per_condition)
            conditions = condition_sampler.sample(mesh, conditions_per_plate)
            pairs = []
            retries = 0
            ok = True
            for condition in conditions:
                while True:
                    problem = solver.build_problem(condition)
                    if not problem.structurally_singular():
                        pairs.append((condition, problem))
                        break
                    stats["solves"] += 1
                    stats["failures"] += 1
                    retries += 1
                    if retries > max_condition_retries:
                        ok = False
                        break
                    condition = condition_sampler.sample_one(mesh)
                if not ok:
                    break
            if not ok:
                continue  # redraw plate
            payloads.append(
                (plate_index + len(payloads) + 1, mesh, solver, pairs)
            )

        # ---- device: group by shape, one dispatch per group -------------
        groups: Dict = {}
        for entry in payloads:
            groups.setdefault(entry[2].shape_key, []).append(entry)

        results_by_plate: Dict = {}
        t0 = timer()
        for key, entries in groups.items():
            group_payloads = [
                (solver, [p for _, p in pairs])
                for _, _, solver, pairs in entries
            ]
            # Pad to half/full chunk sizes so group shapes (and compiles)
            # are bounded.
            pad_to = len(group_payloads)
            for candidate in (1, 2, 4, batch_size):
                if candidate >= pad_to:
                    pad_to = candidate
                    break
            solved = solve_plate_group(group_payloads, pad_group_to=pad_to)
            for (plate_no, mesh, solver, pairs), results in zip(
                entries, solved
            ):
                results_by_plate[plate_no] = (mesh, solver, pairs, results)
        stats["total_solve_time"] += timer() - t0
        stats["solves"] += sum(len(p[3]) for p in payloads)

        # ---- failures: resample + single-plate batch retries ------------
        for plate_no, (mesh, solver, pairs, results) in results_by_plate.items():
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

            # ---- write ---------------------------------------------------
            if any(not r.success for r in results):
                if verbose:
                    print(f"abandoning plate {plate_no} (unsatisfiable)")
                continue
            pixel_map = build_pixel_map(
                mesh.coords, mesh.triangles, image_size, pad_candidates=32
            )
            import os

            plate_dir = os.path.join(data_dir, str(plate_no))
            from .writers import save_gray_png
            from ..raster import geometry_image, outline_image

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
        plate_index += chunk
        if verbose:
            print(
                f"chunk done: {stats['plates']} plates, "
                f"solve time {stats['total_solve_time']:.1f}s"
            )
    return stats
