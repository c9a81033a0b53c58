"""High-level static linear-elasticity problem on a single mesh.

Faithfully reproduces the reference FEAnalysis semantics
(datagen/fea_analysis.py):
  * P1 vector field on the whole domain (:61-69)
  * per-material-region dw_lin_elastic with plane-strain D (:140-161);
    a cell belongs to a region iff ALL its vertices are in the region's
    node set (sfepy cell-region-from-vertices rule) — straddling cells
    contribute no stiffness, exactly as in the reference
  * point loads at force vertices; edge forces divided by the number of
    region vertices and applied at each (:93-124)
  * homogeneous Dirichlet (u.all = 0) on constraint regions (:126-138)
  * incremental loading force(t) = -t * magnitude with t in
    linspace(0, 1, num_steps) (:314-322, 425-432). The problem is linear,
    so u(t) = t * u(1): one solve, scaled per step.
"""

from dataclasses import dataclass
from functools import partial
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import apply_element_stiffness, build_incidence
from .elasticity import element_stiffness, plane_strain_stiffness
from .solver import extract_diagonal, pcg_solve


class SolveResult(NamedTuple):
    displacements: jnp.ndarray  # (num_steps, N, 2) — step 0 is zero load
    strain: jnp.ndarray  # (num_steps, M, 3) el_avg Voigt (exx, eyy, 2exy)
    stress: jnp.ndarray  # (num_steps, M, 3)
    converged: jnp.ndarray  # scalar bool
    failed: jnp.ndarray  # scalar bool (NaN path -> caller resamples)
    residual_norm: jnp.ndarray
    iterations: jnp.ndarray

    @property
    def success(self):
        return bool(self.converged) and not bool(self.failed)


def element_materials(
    triangles: np.ndarray,
    n_nodes: int,
    regions: Sequence[Tuple[Tuple[float, float], np.ndarray]],
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-element (E, nu) from node-set material regions.

    regions: sequence of ((young, poisson), node_indices). An element takes
    a region's material iff all 3 vertices lie in that region (first match
    wins, mirroring sfepy's per-region equations); uncovered elements get
    E = 0 (no stiffness contribution — the straddling-cell quirk).
    """
    triangles = np.asarray(triangles)
    young = np.zeros(len(triangles))
    poisson = np.zeros(len(triangles))
    assigned = np.zeros(len(triangles), dtype=bool)
    for (E, nu), node_ids in regions:
        member = np.zeros(n_nodes, dtype=bool)
        member[np.asarray(node_ids, dtype=np.int64)] = True
        covered = member[triangles].all(axis=1) & ~assigned
        young[covered] = E
        poisson[covered] = nu
        assigned |= covered
    return young, poisson


@dataclass
class StaticProblem:
    """Single-mesh problem. For batched/vmapped datagen see fea_tpu.datagen."""

    coords: np.ndarray  # (N, 2)
    triangles: np.ndarray  # (M, 3)
    young: np.ndarray  # (M,) per-element Young's modulus (0 = uncovered)
    poisson: np.ndarray  # (M,)
    fixed_nodes: np.ndarray  # (N,) bool — u.all = 0
    loads: np.ndarray  # (N, 2) final-step force (already sign-flipped)
    num_steps: int = 11

    @classmethod
    def from_condition(
        cls,
        mesh,
        material_regions: Sequence[Tuple[Tuple[float, float], np.ndarray]],
        point_constraints: Sequence[int],
        edge_constraints: Sequence[Tuple[int, int]],
        point_forces: Sequence[Tuple[int, Tuple[float, float]]],
        edge_forces: Sequence[Tuple[Tuple[int, int], Tuple[float, float]]],
        num_steps: int = 11,
    ) -> "StaticProblem":
        """Build from a sampled condition on a fea_tpu.mesh.Mesh."""
        n = mesh.num_nodes
        fixed = np.zeros(n, dtype=bool)
        for v in point_constraints:
            fixed[int(v)] = True
        for edge in edge_constraints:
            fixed[mesh.nodes_on_edge(edge)] = True

        loads = np.zeros((n, 2))
        for v, (fx, fy) in point_forces:
            loads[int(v)] += (-fx, -fy)  # force(t=1) = -magnitude
        for edge, (fx, fy) in edge_forces:
            nodes = mesh.nodes_on_edge(edge)
            k = max(len(nodes), 1)
            loads[nodes] += (-fx / k, -fy / k)

        young, poisson = element_materials(mesh.triangles, n, material_regions)
        return cls(
            coords=np.asarray(mesh.coords),
            triangles=np.asarray(mesh.triangles),
            young=young,
            poisson=poisson,
            fixed_nodes=fixed,
            loads=loads,
            num_steps=num_steps,
        )

    def solve(
        self,
        tol: Optional[float] = None,
        max_iters: int = 20000,
        dtype=jnp.float64,
        accept_tol: float = 1e-4,
    ) -> SolveResult:
        """`tol` defaults by dtype: 1e-10 (f64) / 1e-6 (f32, the dtype's
        attainable floor). `accept_tol` is the success threshold on the true
        relative residual — looser than `tol`, because the reference only
        rejects solves that go NaN (fea_analysis.py:455-461), not ones that
        merely stop short of machine precision."""
        dtype = jnp.dtype(dtype)
        if dtype == jnp.float64 and not jax.config.jax_enable_x64:
            dtype = jnp.dtype(jnp.float32)
        if tol is None:
            tol = 1e-10 if dtype == jnp.float64 else 1e-6
        incidence = build_incidence(self.triangles, len(self.coords))
        res = _solve_kernel(
            jnp.asarray(self.coords, dtype),
            jnp.asarray(self.triangles, jnp.int32),
            jnp.asarray(self.young, dtype),
            jnp.asarray(self.poisson, dtype),
            incidence.slots,
            jnp.asarray(~self.fixed_nodes, dtype),
            jnp.asarray(self.loads, dtype),
            num_steps=self.num_steps,
            tol=tol,
            max_iters=max_iters,
            accept_tol=accept_tol,
        )
        return res


@partial(jax.jit, static_argnames=("num_steps", "tol", "max_iters", "accept_tol"))
def _solve_kernel(
    coords,
    triangles,
    young,
    poisson,
    incidence_slots,
    free_nodes,
    loads,
    *,
    num_steps: int,
    tol: float,
    max_iters: int,
    accept_tol: float = 1e-4,
) -> SolveResult:
    dtype = coords.dtype
    D = plane_strain_stiffness(young, poisson)
    Ke, B, _area = element_stiffness(coords, triangles, D)
    diag = extract_diagonal(Ke, triangles, coords.shape[0])
    free = free_nodes[:, None].repeat(2, axis=1)

    op = partial(apply_element_stiffness, Ke, triangles, incidence_slots)
    res = pcg_solve(
        op, loads, diag, free, tol=tol, max_iters=max_iters, accept_tol=accept_tol
    )

    t = jnp.linspace(0.0, 1.0, num_steps).astype(dtype)
    u_steps = t[:, None, None] * res.x[None]
    eps1 = jnp.einsum("mij,mj->mi", B, res.x[triangles].reshape(-1, 6))
    sig1 = jnp.einsum("mij,mj->mi", D, eps1)
    strain = t[:, None, None] * eps1[None]
    stress = t[:, None, None] * sig1[None]

    return SolveResult(
        displacements=u_steps,
        strain=strain,
        stress=stress,
        converged=res.converged,
        failed=res.failed,
        residual_norm=res.residual_norm,
        iterations=res.iterations,
    )
