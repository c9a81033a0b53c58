"""Batched Jacobi-preconditioned conjugate-gradient solver.

The TPU-native replacement for the reference's ScipyDirect (SuperLU)
sparse LU (fea_analysis.py:371-375). Matrix-free, static shapes, runs
under jit/vmap, reports convergence + NaN flags that feed the host-side
condition-resampling loop (reference datagen/generate.py:110-124).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    residual_norm: jnp.ndarray  # final |r| / |b|
    iterations: jnp.ndarray
    converged: jnp.ndarray
    failed: jnp.ndarray  # NaN/Inf detected (singular or blow-up)


def block_diagonal(Ke, triangles, n_nodes):
    """Per-node 2x2 diagonal blocks of K (block-Jacobi preconditioner —
    markedly more robust than scalar Jacobi for elasticity, especially with
    the zero-stiffness straddling cells the region semantics produce)."""
    # Ke dof order (x0,y0,x1,y1,x2,y2): node-a self block = Ke[2a:2a+2, 2a:2a+2]
    blocks = jnp.stack(
        [Ke[:, 2 * a : 2 * a + 2, 2 * a : 2 * a + 2] for a in range(3)], axis=1
    )  # (M, 3, 2, 2)
    out = jnp.zeros((n_nodes, 2, 2), Ke.dtype)
    return out.at[triangles.reshape(-1)].add(blocks.reshape(-1, 2, 2))


def invert_blocks(blocks, free_mask):
    """Inverse of 2x2 SPD blocks; identity on fixed/empty nodes."""
    a = blocks[:, 0, 0]
    b = blocks[:, 0, 1]
    c = blocks[:, 1, 0]
    d = blocks[:, 1, 1]
    det = a * d - b * c
    ok = jnp.abs(det) > 1e-30
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    inv = jnp.stack(
        [
            jnp.stack([d * inv_det, -b * inv_det], axis=-1),
            jnp.stack([-c * inv_det, a * inv_det], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(2, dtype=blocks.dtype), inv.shape)
    inv = jnp.where(ok[:, None, None], inv, eye)
    # zero rows/cols for fixed nodes are handled by the free mask outside
    return inv


def pcg_solve(
    operator,
    b,
    diag,
    free_mask,
    x0=None,
    tol: float = 1e-10,
    max_iters: int = 2000,
    accept_tol: float = None,
    block_inv=None,
    restarts: int = 1,
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

    if block_inv is not None:

        def precondition(r):
            return (
                jnp.einsum(
                    "nij,nj->ni",
                    block_inv,
                    r,
                    precision=jax.lax.Precision.HIGHEST,
                )
                * free
            )

    else:

        def precondition(r):
            return inv_diag * r

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
        z = precondition(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    # Restarted CG (iterative refinement): each restart recomputes the true
    # residual, killing the conjugacy/residual drift that stalls or diverges
    # single-sweep CG in float32 on ill-conditioned plates.
    x = jnp.zeros_like(bm) if x0 is None else x0 * free
    total_iters = jnp.array(0)
    for _ in range(max(restarts, 1)):
        r = bm - A(x)
        z = precondition(r)
        rz = jnp.vdot(r, z)
        # a NaN-poisoned x would propagate: reset instead (keeps while_loop
        # shapes static, costs nothing in the healthy path)
        healthy = jnp.isfinite(rz)
        x = jnp.where(healthy, x, 0.0)
        r = jnp.where(healthy, r, bm)
        z = jnp.where(healthy, z, precondition(bm))
        rz = jnp.where(healthy, rz, jnp.vdot(r, precondition(r)))
        x, r, p, rz, k = jax.lax.while_loop(
            cond, body, (x, r, z, rz, jnp.array(0))
        )
        total_iters = total_iters + k

    # Recompute true residual for reporting.
    rtrue = bm - A(x)
    rnorm = jnp.sqrt(jnp.vdot(rtrue, rtrue)) / b_norm
    failed = ~jnp.isfinite(rnorm) | ~jnp.all(jnp.isfinite(x))
    converged = (rnorm <= accept_tol) & ~failed
    return CGResult(
        x=x * free,
        residual_norm=rnorm,
        iterations=total_iters,
        converged=converged,
        failed=failed,
    )


def extract_diagonal(Ke, triangles, n_nodes):
    """Diagonal of assembled K from element blocks (for Jacobi)."""
    diag_e = jnp.diagonal(Ke, axis1=-2, axis2=-1).reshape(-1, 3, 2)  # (M,3,2)
    out = jnp.zeros((n_nodes, 2), Ke.dtype)
    return out.at[triangles.reshape(-1)].add(diag_e.reshape(-1, 2))
