"""Conditional DDPM mode for the FDN-UNet.

The reference frames its Trainer around diffusion (model/diffusion.py:27-34)
but trains a one-shot regressor — the time embedding is commented out of
every forward path (fdnunet.py:607,619; SURVEY.md C21). Its documented
capability surface still includes the conditional-diffusion loop with EMA
(README --use_ema_model; BASELINE config 4). This module makes that mode
functional: a GaussianDiffusion process over displacement images,
conditioned on {materials, forces, constraints} through the FDN pathway,
with jit-compiled training losses and a lax.scan ancestral/DDIM sampler.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .fdnunet import FDNUNet


def linear_beta_schedule(timesteps: int) -> jnp.ndarray:
    scale = 1000.0 / timesteps
    return jnp.linspace(scale * 1e-4, scale * 0.02, timesteps)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> jnp.ndarray:
    steps = jnp.arange(timesteps + 1) / timesteps
    alphas_bar = jnp.cos((steps + s) / (1 + s) * jnp.pi / 2) ** 2
    alphas_bar = alphas_bar / alphas_bar[0]
    betas = 1.0 - alphas_bar[1:] / alphas_bar[:-1]
    return jnp.clip(betas, 0.0, 0.999)


class GaussianDiffusion:
    """DDPM over (H, W, 2) displacement images with FDN conditioning.

    The condition stack is channels [forces(2), constraints(1),
    materials(2)] fed to the FDN feature extractor; the model predicts
    noise (objective='pred_noise') or the clean image ('pred_x0')."""

    def __init__(
        self,
        model: FDNUNet,
        timesteps: int = 1000,
        objective: str = "pred_noise",
        beta_schedule: str = "cosine",
        self_condition: bool = False,
    ):
        assert objective in ("pred_noise", "pred_x0")
        assert model.use_time_embedding, "diffusion needs the time embedding"
        self.model = model
        self.timesteps = timesteps
        self.objective = objective
        self.self_condition = self_condition

        betas = (
            cosine_beta_schedule(timesteps)
            if beta_schedule == "cosine"
            else linear_beta_schedule(timesteps)
        )
        alphas = 1.0 - betas
        alphas_bar = jnp.cumprod(alphas)
        alphas_bar_prev = jnp.concatenate([jnp.ones((1,)), alphas_bar[:-1]])
        self.betas = betas
        self.alphas = alphas
        self.alphas_bar = alphas_bar
        self.sqrt_ab = jnp.sqrt(alphas_bar)
        self.sqrt_1mab = jnp.sqrt(1.0 - alphas_bar)
        self.posterior_var = (
            betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)
        )

    def init(self, rng, image_size: int, batch: int = 1):
        x = jnp.zeros((batch, image_size, image_size, 2))
        cond = jnp.zeros((batch, image_size, image_size, 5))
        t = jnp.zeros((batch,))
        return self.model.init(rng, x, cond, time=t)

    def _predict(self, params, x_t, t, condition, x_self_cond=None):
        return self.model.apply(
            {"params": params}, x_t, condition, x_self_cond, time=t
        )

    def q_sample(self, x0, t, noise):
        a = self.sqrt_ab[t][:, None, None, None]
        s = self.sqrt_1mab[t][:, None, None, None]
        return a * x0 + s * noise

    def _x0_from_noise(self, x_t, t, noise):
        a = self.sqrt_ab[t][:, None, None, None]
        s = self.sqrt_1mab[t][:, None, None, None]
        return (x_t - s * noise) / jnp.maximum(a, 1e-8)

    def loss(self, params, rng, x0, condition):
        """Mean-squared diffusion loss on a batch."""
        b = x0.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, self.timesteps)
        noise = jax.random.normal(rng_n, x0.shape, x0.dtype)
        x_t = self.q_sample(x0, t, noise)
        pred = self._predict(params, x_t, t.astype(jnp.float32), condition)
        target = noise if self.objective == "pred_noise" else x0
        return jnp.mean((pred - target) ** 2)

    @partial(jax.jit, static_argnums=(0, 4))
    def sample(self, params, rng, condition, num_steps: Optional[int] = None):
        """Ancestral DDPM sampling (or strided DDIM when num_steps <
        timesteps), as a lax.scan over the time axis."""
        b, h, w, _ = condition.shape
        shape = (b, h, w, 2)
        steps = num_steps or self.timesteps
        ts = jnp.linspace(self.timesteps - 1, 0, steps).round().astype(jnp.int32)

        def body(carry, t):
            x, rng = carry
            rng, rng_n = jax.random.split(rng)
            tb = jnp.full((b,), t)
            pred = self._predict(
                params, x, tb.astype(jnp.float32), condition
            )
            if self.objective == "pred_noise":
                noise_pred = pred
                x0 = self._x0_from_noise(x, tb, pred)
            else:
                x0 = pred
                a = self.sqrt_ab[tb][:, None, None, None]
                s = self.sqrt_1mab[tb][:, None, None, None]
                noise_pred = (x - a * x0) / jnp.maximum(s, 1e-8)
            x0 = jnp.clip(x0, -1.0, 1.0)

            beta = self.betas[t]
            alpha = self.alphas[t]
            ab = self.alphas_bar[t]
            mean = (
                (x - beta / jnp.sqrt(1.0 - ab) * noise_pred)
                / jnp.sqrt(alpha)
            )
            var = self.posterior_var[t]
            noise = jax.random.normal(rng_n, shape)
            x_next = jnp.where(
                t > 0, mean + jnp.sqrt(var) * noise, x0
            )
            return (x_next, rng), None

        rng, rng0 = jax.random.split(rng)
        x_init = jax.random.normal(rng0, shape)
        (x, _), _ = jax.lax.scan(body, (x_init, rng), ts)
        return x


def make_diffusion_model(
    image_size: int = 256,
    input_dim: int = 64,
    num_stages: int = 4,
    timesteps: int = 1000,
    objective: str = "pred_noise",
    **kw,
) -> GaussianDiffusion:
    model = FDNUNet(
        input_dim=input_dim,
        num_stages=num_stages,
        num_channels=2,
        num_auxiliary_condition_channels=5,  # forces(2)+constraints(1)+materials(2)
        use_time_embedding=True,
        **kw,
    )
    return GaussianDiffusion(
        model, timesteps=timesteps, objective=objective
    )
