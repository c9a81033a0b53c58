"""Two-level (rigid-body-mode aggregation) preconditioner tests.

The coarse space exists because block-Jacobi f32 PCG stalls near 1e-3
relative residual on hard random plates (thin features, point loads,
zero-stiffness straddling cells) that the reference's direct LU
(fea_analysis.py:371-375) solves without complaint.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fea_tpu.fem.coarse import (
    build_aggregates,
    build_block_aggregates,
    build_coarse_matrix,
    coarse_apply,
    coarse_inverse,
    n_coarse_for_bucket,
)
from fea_tpu.fem.elasticity import element_stiffness, plane_strain_stiffness_em
from fea_tpu.fem.problem import StaticProblem
from fea_tpu.mesh import triangulate


@pytest.fixture(scope="module")
def mesh():
    return triangulate(
        np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]),
        mesh_size=0.08,
    )


def test_aggregates_cover_real_nodes(mesh):
    n_coarse = n_coarse_for_bucket(256)
    space = build_aggregates(mesh.coords, n_coarse)
    assert space.agg_ids.shape == (mesh.num_nodes,)
    assert space.agg_ids.min() >= 0
    assert space.agg_ids.max() < n_coarse
    # centroids subtracted: per-aggregate arm sums vanish
    for a in np.unique(space.agg_ids):
        sel = space.agg_ids == a
        np.testing.assert_allclose(
            space.arms[sel].sum(axis=0), 0.0, atol=1e-4
        )


def test_aggregates_ghosts_masked(mesh):
    problem = StaticProblem(
        coords=mesh.coords,
        triangles=mesh.triangles,
        young=np.full(mesh.num_triangles, 1.0),
        poisson=np.full(mesh.num_triangles, 0.3),
        fixed_nodes=np.zeros(mesh.num_nodes, bool),
        loads=np.zeros((mesh.num_nodes, 2)),
        num_steps=2,
    ).padded(mesh.num_nodes + 64, mesh.num_triangles + 64)
    n_coarse = n_coarse_for_bucket(len(problem.coords))
    space = build_aggregates(
        problem.coords, n_coarse, n_real=problem.n_real
    )
    ghosts = slice(mesh.num_nodes, None)
    # ghosts all land in the reserved outlier aggregate with zero arm
    assert (space.agg_ids[ghosts] == n_coarse - 1).all()
    np.testing.assert_array_equal(space.arms[ghosts], 0.0)
    # real aggregates' grid ignores the far-away ghosts: arms stay local
    assert np.abs(space.arms[: mesh.num_nodes]).max() < 0.5


def test_block_aggregates_structure(mesh):
    """Contiguous equal-size RCM blocks (the zero-gather coarse space
    used by the banded datagen path, FEA_TPU_COARSE_BLOCK)."""
    problem = StaticProblem(
        coords=mesh.coords,
        triangles=mesh.triangles,
        young=np.full(mesh.num_triangles, 1.0),
        poisson=np.full(mesh.num_triangles, 0.3),
        fixed_nodes=np.zeros(mesh.num_nodes, bool),
        loads=np.zeros((mesh.num_nodes, 2)),
        num_steps=2,
    ).padded(512, mesh.num_triangles + 64)
    n_pad = len(problem.coords)
    n_coarse = n_coarse_for_bucket(n_pad)
    assert n_pad % n_coarse == 0
    B = n_pad // n_coarse
    space = build_block_aggregates(
        problem.coords, n_coarse, n_real=problem.n_real
    )
    # the whole point: agg ids are a pure reshape pattern
    np.testing.assert_array_equal(
        space.agg_ids, np.arange(n_pad, dtype=np.int32) // B
    )
    # ghosts carry zero arms (they are Dirichlet-fixed padding)
    np.testing.assert_array_equal(space.arms[problem.n_real :], 0.0)
    # real members' arms sum to zero per block (centroid subtracted
    # over real members only, so ghost-straddling blocks stay exact)
    for a in range(n_coarse):
        sel = space.agg_ids == a
        sel[problem.n_real :] = False
        if sel.any():
            np.testing.assert_allclose(
                space.arms[sel].sum(axis=0), 0.0, atol=1e-4
            )
    # every SHAPE_BUCKETS width divides its coarse size (the blocked
    # path's build-time gate in datagen/batched.py relies on it)
    from fea_tpu.datagen.pipeline import SHAPE_BUCKETS

    for b in SHAPE_BUCKETS:
        assert b % n_coarse_for_bucket(b) == 0, b


def test_coarse_apply_flat_blocked_matches_segment():
    """coarse_apply_flat(blocked=True) — reshape row-sums/broadcasts —
    must equal the segment-op path given blocked aggregates, across a
    2-plate flat group (plate p's aggregate ids offset by p*n_coarse
    exactly as flatten_tables produces)."""
    from fea_tpu.fem.flatgroup import coarse_apply_flat

    rng = np.random.default_rng(7)
    P, n_coarse, B = 2, 8, 16
    Nb = n_coarse * B
    n = P * Nb
    agg = (np.arange(n) // B).astype(np.int32)
    arms = rng.normal(size=(n, 2))
    r = rng.normal(size=2 * n)
    nc3 = 3 * n_coarse
    A = rng.normal(size=(P, nc3, nc3))
    Kc_inv = A @ np.transpose(A, (0, 2, 1))  # symmetric, like the real one

    kw = dict(
        Kc_inv=jnp.asarray(Kc_inv),
        agg_ids=jnp.asarray(agg),
        arms=jnp.asarray(arms),
        r_planar=jnp.asarray(r),
        P=P,
        n_coarse=n_coarse,
    )
    z_seg = np.asarray(coarse_apply_flat(**kw))
    z_blk = np.asarray(coarse_apply_flat(**kw, blocked=True))
    np.testing.assert_allclose(z_blk, z_seg, rtol=1e-10, atol=1e-10)


def test_two_level_preconditioner_is_spd(mesh):
    """M^-1 = P Kc^-1 P^T must be symmetric PSD — CG theory requires it."""
    rng = np.random.default_rng(0)
    n = mesh.num_nodes
    young = np.full(mesh.num_triangles, 210000.0)
    poisson = np.full(mesh.num_triangles, 0.3)
    fixed = mesh.coords[:, 0] < 1e-9
    free = jnp.asarray(~fixed, jnp.float64)

    D = plane_strain_stiffness_em(jnp.asarray(young), jnp.asarray(poisson))
    Ke, _, _ = element_stiffness(
        jnp.asarray(mesh.coords), jnp.asarray(mesh.triangles), D
    )
    n_coarse = n_coarse_for_bucket(256)
    space = build_aggregates(mesh.coords, n_coarse)
    agg = jnp.asarray(space.agg_ids)
    arms = jnp.asarray(space.arms, jnp.float64)
    Kc = build_coarse_matrix(
        Ke, jnp.asarray(mesh.triangles), agg, arms, free, n_coarse
    )
    Kc_np = np.asarray(Kc)
    np.testing.assert_allclose(Kc_np, Kc_np.T, rtol=0, atol=1e-6)
    eig = np.linalg.eigvalsh(Kc_np)
    assert eig.min() > 0, eig.min()

    Kc_inv = coarse_inverse(Kc)
    # apply to a few random planar vectors; check symmetry <x, M y> = <M x, y>
    for _ in range(3):
        x = rng.normal(size=2 * n) * np.tile(~fixed, 2)
        y = rng.normal(size=2 * n) * np.tile(~fixed, 2)
        Mx = np.asarray(
            coarse_apply(Kc_inv, agg, arms, jnp.asarray(x), n_coarse)
        )
        My = np.asarray(
            coarse_apply(Kc_inv, agg, arms, jnp.asarray(y), n_coarse)
        )
        assert abs(x @ My - y @ Mx) <= 1e-8 * (
            abs(x @ My) + abs(y @ Mx) + 1.0
        )
        # PSD: <x, M x> >= 0
        assert x @ Mx >= -1e-10


def test_two_level_solve_matches_direct(mesh):
    """End-to-end: the default solve path (now two-level preconditioned)
    still reproduces the f64 direct solution."""
    import scipy.sparse.linalg as spla

    from fea_tpu.fem.assembly import assemble_scipy_csr
    from fea_tpu.fem.elasticity import element_stiffness_np

    n = mesh.num_nodes
    rng = np.random.default_rng(3)
    fixed = mesh.coords[:, 1] < 1e-9
    loads = np.zeros((n, 2))
    tips = np.argsort(mesh.coords[:, 1])[-3:]
    loads[tips] = rng.normal(size=(3, 2)) * 100.0
    problem = StaticProblem(
        coords=mesh.coords,
        triangles=mesh.triangles,
        young=np.full(mesh.num_triangles, 210000.0),
        poisson=np.full(mesh.num_triangles, 0.3),
        fixed_nodes=fixed,
        loads=loads,
        num_steps=2,
    )
    res = problem.solve(tol=1e-12, max_iters=4000)
    assert bool(res.converged)

    Ke, B, D, _ = element_stiffness_np(
        problem.coords, problem.triangles, problem.young, problem.poisson
    )
    K = assemble_scipy_csr(Ke, problem.triangles, n).tocsc()
    idx = np.where(~np.repeat(fixed, 2))[0]
    u = np.zeros(2 * n)
    u[idx] = spla.spsolve(K[np.ix_(idx, idx)], loads.reshape(-1)[idx])
    u_ref = u.reshape(n, 2)
    u_got = np.asarray(res.displacements[-1])
    scale = np.abs(u_ref).max()
    assert np.abs(u_got - u_ref).max() / scale < 1e-8
