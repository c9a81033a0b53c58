"""Exponential moving average of parameters.

The reference used ema_pytorch in its notebooks and documented
--use_ema_model (README.md:85); the Trainer integration was commented
out (diffusion.py:17, 541-545). Here EMA is a first-class option."""

import jax


def ema_update(ema_params, params, decay: float):
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )
