"""Batched Jacobi-preconditioned conjugate-gradient solver.

The TPU-native replacement for the reference's ScipyDirect (SuperLU)
sparse LU (fea_analysis.py:371-375). Matrix-free, static shapes, runs
under jit/vmap, reports convergence + NaN flags that feed the host-side
condition-resampling loop (reference datagen/generate.py:110-124).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    residual_norm: jnp.ndarray  # final |r| / |b|
    iterations: jnp.ndarray
    converged: jnp.ndarray
    failed: jnp.ndarray  # NaN/Inf detected (singular or blow-up)


def pcg_solve(
    operator,
    b,
    diag,
    free_mask,
    x0=None,
    tol: float = 1e-10,
    max_iters: int = 2000,
    accept_tol: float = None,
) -> CGResult:
    """Solve A x = b on the free dofs with Jacobi preconditioning.

    operator: callable u -> K u on full dof vectors (any pytree-free shape).
    b: RHS, same shape; entries at constrained dofs are ignored.
    diag: diagonal of K (for the Jacobi preconditioner), same shape.
    free_mask: 1.0 for free dofs, 0.0 for Dirichlet-constrained dofs.
    Constrained dofs are held at zero (reference uses u.all = 0 EBCs only,
    fea_analysis.py:363-369).

    `tol` drives the iteration; `converged` reports whether the recomputed
    true residual met `accept_tol` (default 100x tol — CG recurrence can
    stagnate slightly above the target at the dtype's roundoff floor).
    """
    if accept_tol is None:
        accept_tol = tol * 100.0
    dtype = b.dtype
    free = free_mask.astype(dtype)
    bm = b * free
    inv_diag = free / jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)

    def A(u):
        return operator(u * free) * free

    x = jnp.zeros_like(bm) if x0 is None else x0 * free
    r = bm - A(x)
    z = inv_diag * r
    p = z
    rz = jnp.vdot(r, z)
    b_norm = jnp.sqrt(jnp.vdot(bm, bm))
    b_norm = jnp.where(b_norm > 0, b_norm, 1.0)
    atol2 = (tol * b_norm) ** 2

    def cond(state):
        x, r, p, rz, k = state
        r2 = jnp.vdot(r, r)
        not_done = (r2 > atol2) & (k < max_iters)
        healthy = jnp.isfinite(r2)
        return not_done & healthy

    def body(state):
        x, r, p, rz, k = state
        Ap = A(p)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    x, r, p, rz, k = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.array(0)))

    # Recompute true residual for reporting.
    rtrue = bm - A(x)
    rnorm = jnp.sqrt(jnp.vdot(rtrue, rtrue)) / b_norm
    failed = ~jnp.isfinite(rnorm) | ~jnp.all(jnp.isfinite(x))
    converged = (rnorm <= accept_tol) & ~failed
    return CGResult(
        x=x * free,
        residual_norm=rnorm,
        iterations=k,
        converged=converged,
        failed=failed,
    )


def extract_diagonal(Ke, triangles, n_nodes):
    """Diagonal of assembled K from element blocks (for Jacobi)."""
    diag_e = jnp.diagonal(Ke, axis1=-2, axis2=-1).reshape(-1, 3, 2)  # (M,3,2)
    out = jnp.zeros((n_nodes, 2), Ke.dtype)
    return out.at[triangles.reshape(-1)].add(diag_e.reshape(-1, 2))
