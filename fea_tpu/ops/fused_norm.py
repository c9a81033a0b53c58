"""Fused GroupNorm(+affine / +SPADE scale-shift)+SiLU Pallas kernels.

Round-4 roofline finding (docs/PERFORMANCE.md "Train-step roofline"):
the FDN-UNet backward pass runs at 75% of HBM peak but only 41% of MXU
peak — the model is conv-heavy with GroupNorms between convs
(models/blocks.py:58-135, reference fdnunetwithaux.py:56-175), and XLA
cannot fuse activation traffic across the norm's two-pass statistics
boundary: the forward reads x once for stats and again to normalize,
and the backward re-reads saved activations for each of its reduction
passes.

These kernels keep one batch element's (HW, C) activation resident in
VMEM and make ONE HBM read of x for the whole norm+affine+SiLU chain
(stats pass + normalize pass both hit the VMEM copy), with f32
statistics regardless of the compute dtype:

  * group sums use a tiny (C, G) one-hot contraction on the MXU instead
    of an in-kernel reshape (lane-dim reshapes are relayouts on TPU);
  * elementwise work is tiled (FUSED_NORM_TILE rows at a time) inside
    the kernel so f32 temporaries stay tile-sized — the block itself is
    the only large VMEM tenant;
  * the custom-VJP backward recomputes statistics from x (nothing but
    (x, affine params, dy) is saved between passes) and emits dx plus
    per-batch-element partial dgamma/dbeta that XLA sums outside.

VMEM bounds the applicability: the forward needs x + y blocks
(2 * HW * C * itemsize), the backward x + dy + dx. At the production
flagship's stage-1 shape (256^2 x 64, bf16) the backward does not fit
one v5e core's ~16 MB VMEM, so `fits_vmem` gates callers; the A/B study
(benchmarks/fused_norm_ab.py, results in docs/fused_norm_ab.json)
measures where the fusion actually pays vs the XLA lowering.

A/B OUTCOME (2026-08-20, tunneled v5e; docs/PERFORMANCE.md "Fused
GroupNorm+SiLU Pallas kernel"): REJECTED for the production model. The
two stage shapes carrying ~80% of the norm-chain HBM traffic do not fit
the VMEM budget at all, and at the deep stages where it fits the chain
is VPU/launch-bound, not HBM-bound, so the saved pass moves nothing
(0.91-1.02x). Kept in-tree as tested Pallas infrastructure; the model
uses the stock XLA lowering (models/blocks.py).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32

# rows per in-kernel elementwise tile; divides every FDN-UNet stage's HW
# (256^2, 128^2, 64^2, 32^2)
FUSED_NORM_TILE = 1024

# conservative per-core VMEM budget for the resident blocks (bytes);
# v5e has ~16 MB — leave headroom for tile temporaries and the compiler
_VMEM_BUDGET = 12 * 1024 * 1024


def fits_vmem(hw: int, channels: int, itemsize: int, n_blocks: int) -> bool:
    """Can `n_blocks` (HW, C) activation blocks co-reside in VMEM?

    The grid iterates over batch elements, so Mosaic DOUBLE-BUFFERS every
    block to overlap the next element's DMA with compute — the scoped
    allocation is 2x the resident blocks (measured on the v5e: the
    (16384, 128) forward, 8 MB of blocks, allocates 16.01 MB and misses
    the 16 MB scoped-vmem limit by 6 KB)."""
    return 2 * n_blocks * hw * channels * itemsize <= _VMEM_BUDGET


def _group_onehot(channels: int, num_groups: int) -> np.ndarray:
    """(C, G) one-hot: channel c belongs to group c // (C/G)."""
    assert channels % num_groups == 0
    cg = channels // num_groups
    m = np.zeros((channels, num_groups), np.float32)
    m[np.arange(channels), np.arange(channels) // cg] = 1.0
    return m


def _stats_loop(x_ref, m_ref, mt_ref, hw: int, channels: int, eps: float):
    """Pass 1: f32 group statistics from the VMEM-resident block.

    Returns per-channel (1, C) f32 (mean_c, rstd_c)."""
    n_tiles = hw // FUSED_NORM_TILE
    cg = channels // m_ref.shape[1]

    def body(i, carry):
        s, ss = carry
        xt = x_ref[0, pl.ds(i * FUSED_NORM_TILE, FUSED_NORM_TILE), :].astype(
            f32
        )
        return (
            s + jnp.sum(xt, axis=0, keepdims=True),
            ss + jnp.sum(xt * xt, axis=0, keepdims=True),
        )

    init = (
        jnp.zeros((1, channels), f32),
        jnp.zeros((1, channels), f32),
    )
    s, ss = jax.lax.fori_loop(0, n_tiles, body, init)
    n_g = float(hw * cg)
    sum_g = jnp.dot(s, m_ref[:], preferred_element_type=f32)  # (1, G)
    sumsq_g = jnp.dot(ss, m_ref[:], preferred_element_type=f32)
    mean_g = sum_g / n_g
    var_g = sumsq_g / n_g - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, mt_ref[:], preferred_element_type=f32)
    rstd_c = jnp.dot(rstd_g, mt_ref[:], preferred_element_type=f32)
    return mean_c, rstd_c


def _fwd_kernel(
    x_ref, gamma_ref, beta_ref, m_ref, mt_ref, y_ref, *, hw, channels, eps
):
    mean_c, rstd_c = _stats_loop(x_ref, m_ref, mt_ref, hw, channels, eps)
    # fold: z = x * a + b with a = rstd*gamma, b = beta - mean*rstd*gamma
    a = rstd_c * gamma_ref[:].astype(f32)
    b = beta_ref[:].astype(f32) - mean_c * a

    def body(i, _):
        sl = pl.ds(i * FUSED_NORM_TILE, FUSED_NORM_TILE)
        z = x_ref[0, sl, :].astype(f32) * a + b
        y_ref[0, sl, :] = (z * jax.nn.sigmoid(z)).astype(y_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hw // FUSED_NORM_TILE, body, 0)


def _bwd_kernel(
    x_ref,
    gamma_ref,
    beta_ref,
    m_ref,
    mt_ref,
    dy_ref,
    dx_ref,
    dgamma_ref,
    dbeta_ref,
    *,
    hw,
    channels,
    eps,
):
    """Recompute stats, then the GroupNorm+affine+SiLU VJP.

    z = x_hat * gamma + beta, y = z * sigmoid(z)
    dz = dy * sigmoid(z) * (1 + z * (1 - sigmoid(z)))
    dx = rstd * (dxh - mean_g(dxh) - x_hat * mean_g(dxh * x_hat)),
    with dxh = dz * gamma and mean_g over each (b, group).
    """
    mean_c, rstd_c = _stats_loop(x_ref, m_ref, mt_ref, hw, channels, eps)
    gamma = gamma_ref[:].astype(f32)
    beta = beta_ref[:].astype(f32)
    a = rstd_c * gamma
    b = beta - mean_c * a
    n_tiles = hw // FUSED_NORM_TILE
    cg = channels // m_ref.shape[1]
    n_g = float(hw * cg)

    # pass 2: per-channel reduction of dz, dz*x_hat, dxh, dxh*x_hat
    def body2(i, carry):
        s_dz, s_dzxh, s_dxh, s_dxhxh = carry
        sl = pl.ds(i * FUSED_NORM_TILE, FUSED_NORM_TILE)
        xt = x_ref[0, sl, :].astype(f32)
        z = xt * a + b
        sig = jax.nn.sigmoid(z)
        dz = dy_ref[0, sl, :].astype(f32) * sig * (1.0 + z * (1.0 - sig))
        xh = (xt - mean_c) * rstd_c
        dxh = dz * gamma
        return (
            s_dz + jnp.sum(dz, axis=0, keepdims=True),
            s_dzxh + jnp.sum(dz * xh, axis=0, keepdims=True),
            s_dxh + jnp.sum(dxh, axis=0, keepdims=True),
            s_dxhxh + jnp.sum(dxh * xh, axis=0, keepdims=True),
        )

    zeros = jnp.zeros((1, channels), f32)
    s_dz, s_dzxh, s_dxh, s_dxhxh = jax.lax.fori_loop(
        0, n_tiles, body2, (zeros, zeros, zeros, zeros)
    )
    # dgamma/dbeta blocks are the full (B, C) arrays (Mosaic requires
    # sublane-divisible or full blocks); each grid step owns one row
    pid = pl.program_id(0)
    dbeta_ref[pl.ds(pid, 1), :] = s_dz
    dgamma_ref[pl.ds(pid, 1), :] = s_dzxh
    mean_dxh = jnp.dot(
        jnp.dot(s_dxh, m_ref[:], preferred_element_type=f32) / n_g,
        mt_ref[:],
        preferred_element_type=f32,
    )
    mean_dxhxh = jnp.dot(
        jnp.dot(s_dxhxh, m_ref[:], preferred_element_type=f32) / n_g,
        mt_ref[:],
        preferred_element_type=f32,
    )

    # pass 3: dx (dy tile is read before the aliased dx tile is written)
    def body3(i, _):
        sl = pl.ds(i * FUSED_NORM_TILE, FUSED_NORM_TILE)
        xt = x_ref[0, sl, :].astype(f32)
        z = xt * a + b
        sig = jax.nn.sigmoid(z)
        dz = dy_ref[0, sl, :].astype(f32) * sig * (1.0 + z * (1.0 - sig))
        xh = (xt - mean_c) * rstd_c
        dxh = dz * gamma
        dx = rstd_c * (dxh - mean_dxh - xh * mean_dxhxh)
        dx_ref[0, sl, :] = dx.astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, body3, 0)


def _block_specs(batch, hw, channels, num_groups):
    act = pl.BlockSpec((1, hw, channels), lambda b: (b, 0, 0))
    vec = pl.BlockSpec((1, channels), lambda b: (0, 0))
    m = pl.BlockSpec((channels, num_groups), lambda b: (0, 0))
    mt = pl.BlockSpec((num_groups, channels), lambda b: (0, 0))
    return act, vec, m, mt


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def group_norm_silu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int = 8,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """silu(GroupNorm(x) * gamma + beta) in one HBM read of x.

    x: (B, H, W, C) NHWC (or (B, HW, C)); gamma/beta: (C,).
    Matches flax nn.GroupNorm(num_groups)(x) -> affine -> silu.
    """
    y, _ = _gn_fwd(x, gamma, beta, num_groups, eps, interpret)
    return y


def _prep(x, num_groups):
    shape = x.shape
    if x.ndim == 4:
        b, h, w, c = shape
        x3 = x.reshape(b, h * w, c)
    else:
        b, hw, c = shape
        x3 = x
    hw = x3.shape[1]
    assert hw % FUSED_NORM_TILE == 0, (
        f"HW {hw} must be a multiple of {FUSED_NORM_TILE}"
    )
    m = jnp.asarray(_group_onehot(x3.shape[2], num_groups))
    return x3, m, m.T, shape


def _gn_fwd(x, gamma, beta, num_groups, eps, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    x3, m, mt, shape = _prep(x, num_groups)
    b, hw, c = x3.shape
    act, vec, msp, mtsp = _block_specs(b, hw, c, num_groups)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, hw=hw, channels=c, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=(b,),
        in_specs=[act, vec, vec, msp, mtsp],
        out_specs=act,
        interpret=interpret,
    )(x3, gamma.reshape(1, c), beta.reshape(1, c), m, mt)
    return y.reshape(shape), (x, gamma, beta)


def _gn_bwd(num_groups, eps, interpret, residuals, dy):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    x, gamma, beta = residuals
    x3, m, mt, shape = _prep(x, num_groups)
    b, hw, c = x3.shape
    dy3 = dy.reshape(b, hw, c)
    act, vec, msp, mtsp = _block_specs(b, hw, c, num_groups)
    pvec = pl.BlockSpec((b, c), lambda bb: (0, 0))
    dx, dgamma_b, dbeta_b = pl.pallas_call(
        functools.partial(_bwd_kernel, hw=hw, channels=c, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((b, hw, c), x.dtype),
            jax.ShapeDtypeStruct((b, c), f32),
            jax.ShapeDtypeStruct((b, c), f32),
        ),
        grid=(b,),
        in_specs=[act, vec, vec, msp, mtsp, act],
        out_specs=(act, pvec, pvec),
        # dy's block is consumed tile-by-tile before dx's is written
        input_output_aliases={5: 0},
        interpret=interpret,
    )(x3, gamma.reshape(1, c), beta.reshape(1, c), m, mt, dy3)
    return (
        dx.reshape(shape),
        dgamma_b.sum(axis=0).astype(gamma.dtype),
        dbeta_b.sum(axis=0).astype(beta.dtype),
    )


group_norm_silu.defvjp(_gn_fwd, _gn_bwd)
