"""Pallas TPU flash attention (tiled online-softmax).

The TPU analog of the reference's CUDA flash/math switch
(model/attentionutils.py:13-95 picks torch's flash SDPA on A100, else an
einsum softmax). Here the "math" path is the XLA einsum chain in
models/attention.py and this kernel is the fused path: Q-tiles stream
KV-tiles through VMEM with a running max/denominator, so the (N x N)
score matrix never materializes in HBM.

Layout: q, k, v are (batch*heads, seq, head_dim); seq is padded to the
tile size with masked rows. head_dim pads to the 128-lane width.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, len_ref, o_ref, *, block_k: int):
    """One Q tile vs all KV tiles. Refs are VMEM blocks:
    q_ref (Bq, D), k_ref (Nk, D), v_ref (Nk, D), len_ref (1,1) SMEM,
    o_ref (Bq, D)."""
    q = q_ref[0].astype(jnp.float32)
    seq_len = len_ref[0, 0]
    n_k = k_ref.shape[1]
    num_tiles = n_k // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bq, block_k)
        # mask padded KV rows
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        valid = (i * block_k + col) < seq_len
        scores = jnp.where(valid, scores, NEG_INF)

        m_new = jnp.maximum(m_prev, scores.max(axis=1, keepdims=True))
        p = jnp.exp(scores - m_new)
        scale = jnp.exp(m_prev - m_new)
        l_new = l_prev * scale + p.sum(axis=1, keepdims=True)
        acc = acc * scale + jax.lax.dot_general(
            p, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    bq = o_ref.shape[1]
    dp = o_ref.shape[2]
    acc = jnp.zeros((bq, dp), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_tiles, body, (acc, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


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
    block_q: int = 128,
    block_k: int = 128,
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
    block_q: int = 128,
    block_k: int = 128,
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
    lens = jnp.full((1, 1), n_k, jnp.int32)

    grid = (bh, nq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d_pad),
                lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nk_pad, d_pad), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nk_pad, d_pad), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, lens)
    return out[:, :n_q, :d]
