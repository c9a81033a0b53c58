"""Banded CG operator + band-block Jacobi preconditioner tests.

The flat datagen kernel's matvec is a block-shifted dense band
(fem/banded.py); the band also materializes K's (B x B) diagonal blocks
as a contiguous slice, which powers the band-block Jacobi smoother
(`band_block_diagonal` / `spd_block_inverse`) — a far stronger
preconditioner than the per-node 2x2 at ~B/W extra HBM per iteration.
These tests pin down (1) the block extraction against a dense scipy
assembly, (2) the SPD/masking contract CG theory requires of M, and
(3) end-to-end equivalence + an iteration-count win on the real flat
chunk kernel. Replaces the preconditioning work the reference never
needed (its SuperLU is direct — datagen/fea_analysis.py:371-375).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from fea_tpu.fem.assembly import assemble_scipy_csr
from fea_tpu.fem.banded import (
    BAND_R,
    assemble_band,
    band_assembly_indices,
    band_block_diagonal,
    block_jacobi_apply,
    gram_apply,
    quantize_hb,
    rcm_permutation,
    spd_block_inv_factor,
    spd_block_inverse,
)
from fea_tpu.fem.elasticity import element_stiffness, plane_strain_stiffness_em
from fea_tpu.mesh import triangulate

UNIT_SQUARE = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])


@pytest.fixture(scope="module")
def banded_setup():
    """Permuted mesh + assembled band + dense reference K (f64)."""
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.05)
    n = mesh.num_nodes
    perm, hb_nat = rcm_permutation(mesh.triangles, n)
    inv = np.argsort(perm)
    coords = mesh.coords[perm]
    tris = inv[mesh.triangles].astype(np.int64)
    hb = quantize_hb(hb_nat)
    n_pad = ((n + 63) // 64) * 64

    young = jnp.full(mesh.num_triangles, 3.7e4, jnp.float64)
    poisson = jnp.full(mesh.num_triangles, 0.27, jnp.float64)
    D = plane_strain_stiffness_em(young, poisson)
    Ke, _, _ = element_stiffness(
        jnp.asarray(coords, jnp.float64), jnp.asarray(tris), D
    )

    idx = band_assembly_indices(tris, n_pad, hb)
    S = assemble_band(Ke, jnp.asarray(idx), 2 * n_pad, hb)

    # assemble_scipy_csr wants element-major (M,6,6); Ke is element-minor
    K = assemble_scipy_csr(np.asarray(Ke).transpose(2, 0, 1), tris, n).toarray()
    K_pad = np.zeros((2 * n_pad, 2 * n_pad))
    K_pad[: 2 * n, : 2 * n] = K
    return mesh, hb, n_pad, S, K_pad


@pytest.mark.parametrize("block", [128, 256])
def test_band_block_diagonal_matches_dense(banded_setup, block):
    _, hb, n_pad, S, K_pad = banded_setup
    D = np.asarray(band_block_diagonal(S, hb, block))
    nb = 2 * n_pad // block
    assert D.shape == (nb, block, block)
    for g in range(nb):
        sl = slice(g * block, (g + 1) * block)
        np.testing.assert_allclose(D[g], K_pad[sl, sl], rtol=0, atol=1e-9)


def test_spd_block_inverse_contract(banded_setup):
    """M must be exactly symmetric, PSD, zero at fixed dofs, and equal to
    the true masked-block inverse where the mask is all-free."""
    _, hb, n_pad, S, K_pad = banded_setup
    block = 128
    D = band_block_diagonal(S, hb, block)
    nb = D.shape[0]
    rng = np.random.default_rng(5)
    free = (rng.random((nb, block)) > 0.15).astype(np.float64)
    free[1] = 1.0  # one all-free block for the exact-inverse check
    Dinv = np.asarray(spd_block_inverse(D, jnp.asarray(free)))

    # symmetric by construction (Gram form)
    np.testing.assert_array_equal(Dinv, np.transpose(Dinv, (0, 2, 1)))
    # PSD: smallest eigenvalue nonnegative up to roundoff
    for g in range(nb):
        w = np.linalg.eigvalsh(Dinv[g])
        assert w.min() >= -1e-10 * max(w.max(), 1.0)
    # fixed rows/cols are zero — M never injects residual there
    fixed = free == 0.0
    assert np.abs(Dinv[fixed]).max() == 0.0
    # all-free block: matches the dense inverse (ridge-perturbed)
    Dg = np.asarray(D[1])
    ref = np.linalg.inv(Dg + 1e-7 * np.diag(Dg).max() * np.eye(block))
    scale = np.abs(ref).max()
    assert np.abs(Dinv[1] - ref).max() / scale < 1e-5

    # apply == blockdiag matvec
    x = rng.normal(size=2 * n_pad)
    z = np.asarray(block_jacobi_apply(jnp.asarray(Dinv), jnp.asarray(x)))
    zref = np.concatenate(
        [Dinv[g] @ x[g * block : (g + 1) * block] for g in range(nb)]
    )
    np.testing.assert_allclose(z, zref, rtol=1e-12, atol=1e-12)


def test_gram_factor_matches_inverse_and_stays_spd(banded_setup):
    """The kernel applies M via the Gram factor (bf16-storable): it must
    match the explicit inverse in f64, and the bf16 factor's implied M
    must still be exactly symmetric PSD (the reason Gram form exists)."""
    _, hb, n_pad, S, _ = banded_setup
    block = 128
    D = band_block_diagonal(S, hb, block)
    nb = D.shape[0]
    rng = np.random.default_rng(9)
    free = (rng.random((nb, block)) > 0.1).astype(np.float64)
    Dinv = spd_block_inverse(D, jnp.asarray(free))
    Linv64 = spd_block_inv_factor(
        D, jnp.asarray(free), out_dtype=jnp.float64
    )
    x = jnp.asarray(rng.normal(size=2 * n_pad))
    z_inv = np.asarray(block_jacobi_apply(Dinv, x))
    z_gram = np.asarray(gram_apply(Linv64, x))
    scale = max(np.abs(z_inv).max(), 1e-30)
    assert np.abs(z_gram - z_inv).max() / scale < 1e-10

    # bf16 factor: implied M = L~^T L~ exactly symmetric PSD
    Linv16 = np.asarray(
        spd_block_inv_factor(D, jnp.asarray(free))
    ).astype(np.float64)
    for g in range(nb):
        M = Linv16[g].T @ Linv16[g]
        np.testing.assert_array_equal(M, M.T)
        w = np.linalg.eigvalsh(M)
        assert w.min() >= -1e-12 * max(w.max(), 1.0)
    # fixed columns zeroed -> M fixed rows/cols zero
    fixed_cols = np.asarray(free) == 0.0
    assert np.abs(np.transpose(Linv16, (0, 2, 1))[fixed_cols]).max() == 0.0


def test_flat_kernel_band_block_equivalence_and_iterations(monkeypatch):
    """The flat chunk kernel with band-block Jacobi must reproduce the
    2x2-preconditioned solutions and converge in FEWER lockstep
    iterations — the whole point of the stronger smoother."""
    from fea_tpu.datagen.batched import PlateSolver, solve_plate_group
    from fea_tpu.datagen.conditions import ConditionSampler

    mesh = triangulate(UNIT_SQUARE, mesh_size=0.05)
    solver = PlateSolver(mesh, num_steps=2)
    if solver.band_hb == 0:
        pytest.skip("mesh too small for the banded path on this bucket")

    sampler = ConditionSampler(random_seed=11)
    problems = []
    for _ in range(80):
        p = solver.build_problem(sampler.sample_one(mesh))
        if not p.structurally_singular():
            problems.append(p)
        if len(problems) == 3:
            break
    assert len(problems) == 3

    monkeypatch.setenv("FEA_TPU_FLAT_CHUNK", "1")
    monkeypatch.delenv("FEA_TPU_BAND_BLOCK", raising=False)
    base = solve_plate_group([(solver, problems)])[0]
    monkeypatch.setenv("FEA_TPU_BAND_BLOCK", "128")
    bbj = solve_plate_group([(solver, problems)])[0]

    compared = 0
    it_base = it_bbj = 0
    for b, f in zip(base, bbj):
        if not (b.success and f.success):
            continue
        bu, fu = np.asarray(b.displacements), np.asarray(f.displacements)
        scale = max(np.abs(bu).max(), 1e-12)
        assert np.abs(bu - fu).max() / scale < 1e-3
        it_base += int(b.iterations)
        it_bbj += int(f.iterations)
        compared += 1
    assert compared >= 2, f"only {compared} mutually-converged lanes"
    assert it_bbj < it_base, (
        f"band-block Jacobi did not reduce iterations: {it_bbj} vs {it_base}"
    )
