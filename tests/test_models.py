import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fea_tpu.models import FDNUNet, UNet, create_models

REFERENCE = "/root/reference"


def _init_trio(S=32, B=2):
    enc, dec, aux = create_models(
        input_dim=64,
        image_height=S,
        image_width=S,
        num_channels=2,
        num_auxiliary_condition_channels=3,
        num_stages=4,
    )
    rng = jax.random.PRNGKey(0)
    materials = jnp.zeros((B, S, S, 2), jnp.float32)
    conditions = jnp.zeros((B, S, S, 3), jnp.float32)
    ev = enc.init(rng, materials, conditions)
    x, hidden, residual = enc.apply(ev, materials, conditions)
    dv = dec.init(rng, x, list(hidden), residual)
    av = aux.init(rng, x)
    return (enc, dec, aux), (ev, dv, av), (materials, conditions, x, hidden, residual)


def test_fdnunet_trio_shapes():
    S, B = 32, 2
    (enc, dec, aux), (ev, dv, av), (materials, conditions, x, hidden, residual) = (
        _init_trio(S, B)
    )
    # middle: S/8 spatial, 512 channels
    assert x.shape == (B, S // 8, S // 8, 512)
    assert len(hidden) == 8
    assert residual.shape == (B, S, S, 64)

    out = dec.apply(dv, x, list(hidden), residual)
    assert out.shape == (B, S, S, 2)

    sign, log = aux.apply(av, x)
    assert sign.shape == (B, 4) and log.shape == (B, 4)
    assert (np.asarray(sign) >= 0).all() and (np.asarray(sign) <= 1).all()


def _count(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_param_count_parity_with_reference():
    """Topology check: our flax modules have exactly the reference torch
    modules' parameter counts (same dims/connectivity, NHWC vs NCHW)."""
    sys.path.insert(0, REFERENCE)
    try:
        from model.fdnunetwithaux import create_models as torch_create
    finally:
        sys.path.pop(0)

    t_enc, t_dec, t_aux = torch_create(
        input_dim=64,
        image_height=32,
        image_width=32,
        num_channels=2,
        num_auxiliary_condition_channels=3,
        num_stages=4,
    )
    t_counts = [
        sum(p.numel() for p in m.parameters()) for m in (t_enc, t_dec, t_aux)
    ]

    _, (ev, dv, av), _ = _init_trio(S=32)
    j_counts = [_count(v["params"]) for v in (ev, dv, av)]
    assert j_counts == t_counts, f"jax {j_counts} vs torch {t_counts}"


def test_monolithic_fdnunet_forward():
    S, B = 32, 1
    model = FDNUNet(
        input_dim=32,
        num_stages=3,
        num_channels=2,
        num_auxiliary_condition_channels=3,
        attention_head_dim=8,
        num_attention_heads=2,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((B, S, S, 2))
    cond = jnp.zeros((B, S, S, 3))
    variables = model.init(rng, x, cond)
    out = model.apply(variables, x, cond)
    assert out.shape == (B, S, S, 2)
    # amax normalization: per-channel max is 1
    np.testing.assert_allclose(
        np.asarray(out).max(axis=(1, 2)), 1.0, rtol=1e-5
    )


def test_plain_unet_forward():
    S, B = 32, 1
    model = UNet(
        input_dim=32,
        num_stages=3,
        num_channels=2,
        num_condition_channels=4,
        attention_head_dim=8,
        num_attention_heads=2,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((B, S, S, 2))
    cond = jnp.zeros((B, S, S, 4))
    variables = model.init(rng, x, cond)
    out = model.apply(variables, x, cond)
    assert out.shape == (B, S, S, 2)


def test_fdnunet_time_embedding_mode():
    S = 16
    model = FDNUNet(
        input_dim=16,
        num_stages=2,
        num_channels=2,
        num_auxiliary_condition_channels=3,
        attention_head_dim=8,
        num_attention_heads=2,
        use_time_embedding=True,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, S, S, 2))
    cond = jnp.zeros((1, S, S, 3))
    t = jnp.array([0.5])
    variables = model.init(rng, x, cond, time=t)
    out = model.apply(variables, x, cond, time=t)
    assert out.shape == (1, S, S, 2)


def test_diffusion_mode_loss_and_sampling():
    from fea_tpu.models.diffusion import make_diffusion_model

    S = 16
    diffusion = make_diffusion_model(
        image_size=S,
        input_dim=16,
        num_stages=2,
        timesteps=8,
        attention_head_dim=8,
        num_attention_heads=2,
    )
    rng = jax.random.PRNGKey(0)
    variables = diffusion.init(rng, S, batch=2)
    params = variables["params"]

    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, S, S, 2))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, S, S, 5))
    loss = diffusion.loss(params, jax.random.PRNGKey(3), x0, cond)
    assert np.isfinite(float(loss))

    grads = jax.grad(
        lambda p: diffusion.loss(p, jax.random.PRNGKey(4), x0, cond)
    )(params)
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    samples = diffusion.sample(params, jax.random.PRNGKey(5), cond, 4)
    assert samples.shape == (2, S, S, 2)
    assert np.isfinite(np.asarray(samples)).all()


def test_flash_attention_matches_einsum():
    """Pallas flash attention (interpret mode on CPU) matches the plain
    softmax einsum path, including non-tile-multiple KV lengths (memory
    KV slots)."""
    from fea_tpu.ops import flash_attention

    rng = np.random.default_rng(0)
    bh, nq, nk, d = 3, 100, 68, 32
    q = jnp.asarray(rng.normal(size=(bh, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bh, nk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bh, nk, d)), jnp.float32)

    out = flash_attention(q, k, v, block_q=32, block_k=32, interpret=True)

    scores = jnp.einsum("bnd,bmd->bnm", q, k) * (d**-0.5)
    ref = jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(scores, axis=-1), v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_fused_group_norm_silu_matches_flax():
    """Pallas fused GroupNorm+affine+SiLU (fea_tpu/ops/fused_norm.py,
    interpret mode on CPU) matches flax nn.GroupNorm -> affine -> silu
    in forward AND the full VJP (dx, dgamma, dbeta)."""
    import flax.linen as nn

    from fea_tpu.ops.fused_norm import group_norm_silu

    B, H, W, C, G = 2, 32, 32, 64, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)

    gn = nn.GroupNorm(num_groups=G, use_bias=False, use_scale=False)
    gn_vars = gn.init(jax.random.PRNGKey(0), x)

    def ref(x, gamma, beta):
        return nn.silu(gn.apply(gn_vars, x) * gamma + beta)

    y_ref = ref(x, gamma, beta)
    y = group_norm_silu(x, gamma, beta, G)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), atol=5e-5, rtol=1e-4
    )

    g_ref = jax.grad(
        lambda *a: jnp.sum(ref(*a) * ct), argnums=(0, 1, 2)
    )(x, gamma, beta)
    g = jax.grad(
        lambda *a: jnp.sum(group_norm_silu(*a, G) * ct), argnums=(0, 1, 2)
    )(x, gamma, beta)
    for got, want in zip(g, g_ref):
        scale = max(float(jnp.abs(want).max()), 1e-6)
        assert float(jnp.abs(got - want).max()) / scale < 1e-4


def test_fdnunet_flash_attention_variant():
    S = 32
    outs = []
    for flash in (False, True):
        model = FDNUNet(
            input_dim=16,
            num_stages=2,
            num_channels=2,
            num_auxiliary_condition_channels=3,
            attention_head_dim=8,
            num_attention_heads=2,
            use_flash_attention=flash,
        )
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, S, S, 2))
        cond = jax.random.normal(jax.random.PRNGKey(2), (1, S, S, 3))
        variables = model.init(rng, x, cond)
        outs.append(np.asarray(model.apply(variables, x, cond)))
    # same params (same init RNG), flash vs math attention agree
    np.testing.assert_allclose(outs[0], outs[1], atol=5e-4)


def test_amax_normalize_zero_divisor_guard():
    """amax_normalize must stay finite when the spatial max is 0 (the
    unguarded reference quirk yields 0/0 = NaN; observed poisoning the
    2026-08-18 bf16 production run) and be exact elsewhere."""
    import jax.numpy as jnp

    from fea_tpu.models.blocks import amax_normalize

    # healthy case: identical to plain division
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)))
    np.testing.assert_allclose(
        np.asarray(amax_normalize(x)),
        np.asarray(x / jnp.max(x, axis=(1, 2), keepdims=True)),
    )
    # pathological case: all-nonpositive with zeros present
    z = jnp.asarray(-np.random.default_rng(1).random((1, 4, 4, 2)))
    z = z.at[0, 0, 0, :].set(0.0)
    out = np.asarray(amax_normalize(z))
    assert np.isfinite(out).all()
