"""Pallas TPU flash attention (tiled online-softmax).

The TPU analog of the reference's CUDA flash/math switch
(model/attentionutils.py:13-95 picks torch's flash SDPA on A100, else an
einsum softmax). Here the "math" path is the XLA einsum chain in
models/attention.py and this kernel is the fused path: KV tiles stream
through VMEM along the innermost (sequential) grid axis with running
max/denominator scratch, so neither the (N x N) score matrix nor the full
K/V ever sit in VMEM — memory is O(block) and sequence length is bounded
by HBM, not VMEM.

Layout: q, k, v are (batch*heads, seq, head_dim); seq pads to the tile
size with masked rows; head_dim pads to the 128-lane width.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    len_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, block_k: int
):
    """Grid (bh, nq_tiles, nk_tiles); the kv axis is innermost and
    sequential on TPU, so VMEM scratch carries the online-softmax state
    across kv tiles. Block refs: q (1,Bq,D), k/v (1,Bk,D), o (1,Bq,D)."""
    j = pl.program_id(2)
    n_j = pl.num_programs(2)
    seq_len = len_ref[0]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Bq, Bk)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    valid = (j * block_k + col) < seq_len
    scores = jnp.where(valid, scores, NEG_INF)

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, scores.max(axis=1, keepdims=True))
    p = jnp.exp(scores - m_new)
    scale = jnp.exp(m_prev - m_new)
    l_ref[:] = l_prev * scale + p.sum(axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * scale + jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(j == n_j - 1)
    def _():
        o_ref[0] = (
            acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        ).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(
    q,
    k,
    v,
    scale: float = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = None,
):
    """softmax(q k^T * scale) v for (BH, Nq, D) tensors; Nk may differ
    from Nq (e.g. learned memory-KV slots prepended). `interpret` defaults
    to True on CPU backends (compiled Pallas is TPU-only)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _flash_attention(
        q, k, v, scale, block_q=block_q, block_k=block_k, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_attention(
    q,
    k,
    v,
    scale: float = None,
    *,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
):
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    if scale is None:
        scale = d**-0.5

    d_pad = max(128, ((d + 127) // 128) * 128)
    nq_pad = ((n_q + block_q - 1) // block_q) * block_q
    nk_pad = ((n_k + block_k - 1) // block_k) * block_k

    q_p = _pad_to(_pad_to(q * scale, nq_pad, 1), d_pad, 2)
    k_p = _pad_to(_pad_to(k, nk_pad, 1), d_pad, 2)
    v_p = _pad_to(_pad_to(v, nk_pad, 1), d_pad, 2)
    lens = jnp.full((1,), n_k, jnp.int32)

    grid = (bh, nq_pad // block_q, nk_pad // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d_pad), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_q, d_pad), lambda b, i, j, *_: (b, i, 0)
                ),
                pl.BlockSpec(
                    (1, block_k, d_pad), lambda b, i, j, *_: (b, j, 0)
                ),
                pl.BlockSpec(
                    (1, block_k, d_pad), lambda b, i, j, *_: (b, j, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d_pad), lambda b, i, j, *_: (b, i, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, d_pad), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(lens, q_p, k_p, v_p)
    return out[:, :n_q, :d]
