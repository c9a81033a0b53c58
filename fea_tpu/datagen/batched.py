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

from typing import Dict, List, Optional, Tuple

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
    jax.jit, static_argnames=("tol", "max_iters", "accept_tol", "restarts")
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
        return jnp.concatenate(
            [
                res.x.reshape(-1).astype(f32),
                eps1.reshape(-1).astype(f32),
                sig1.reshape(-1).astype(f32),
                jnp.stack(
                    [
                        res.converged.astype(f32),
                        res.failed.astype(f32),
                        res.residual_norm.astype(f32),
                        res.iterations.astype(f32),
                    ]
                ),
            ]
        )

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
