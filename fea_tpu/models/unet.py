"""Plain conditional UNet baseline (reference model/unet.py:287-546 —
lucidrains-style; unused by the reference's current training but part of
its model-family surface). Conditions are concatenated input channels
(no FDN); attention is linear at outer stages and full at the innermost;
output uses the same amax normalization."""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .attention import FullAttention, LinearAttention
from .blocks import (
    ConditionedResnetBlock,
    Downsample,
    Upsample,
    amax_normalize,
)
from .fdnunet import _stage_dims
from .time_embedding import TimeEmbeddingMLP


class UNet(nn.Module):
    input_dim: int
    initial_dim: Optional[int] = None
    final_dim: Optional[int] = None
    num_stages: int = 4
    num_channels: int = 3
    num_condition_channels: Optional[int] = None
    self_condition: bool = False
    num_groups: int = 8
    attention_head_dim: int = 32
    num_attention_heads: int = 4
    use_full_attention: bool = False
    use_flash_attention: bool = False
    use_time_embedding: bool = False

    @property
    def max_resolution(self):
        return 2 ** (self.num_stages - 1)

    @nn.compact
    def __call__(self, x, x_condition=None, x_self_condition=None, time=None):
        assert all(d % self.max_resolution == 0 for d in x.shape[1:3])
        dims = _stage_dims(self.input_dim, self.initial_dim, self.num_stages)
        pairs = list(zip(dims[:-1], dims[1:]))
        final_dim = (
            self.final_dim if self.final_dim is not None else self.num_channels
        )
        full_attn = (
            (True,) * self.num_stages
            if self.use_full_attention
            else (False,) * (self.num_stages - 1) + (True,)
        )

        if self.self_condition:
            if x_self_condition is None:
                x_self_condition = jnp.zeros_like(x)
            x = jnp.concatenate([x, x_self_condition], axis=-1)
        if self.num_condition_channels is not None and x_condition is not None:
            x = jnp.concatenate([x, x_condition], axis=-1)

        time_embedding = None
        if self.use_time_embedding and time is not None:
            time_embedding = TimeEmbeddingMLP(self.input_dim)(time)

        def block(dim, name):
            return ConditionedResnetBlock(
                dim, use_fdn=False, num_groups=self.num_groups, name=name
            )

        def attn(use_full, name):
            if use_full:
                return FullAttention(
                    num_heads=self.num_attention_heads,
                    head_dim=self.attention_head_dim,
                    use_flash=self.use_flash_attention,
                    name=name,
                )
            return LinearAttention(
                num_heads=self.num_attention_heads,
                head_dim=self.attention_head_dim,
                name=name,
            )

        x = nn.Conv(dims[0], (3, 3), padding=1, name="initial_conv")(x)
        residual = x

        hidden_states = []
        for index, (in_dim, out_dim) in enumerate(pairs):
            is_last = index == self.num_stages - 1
            x = block(in_dim, f"down{index}_block1")(x, None, time_embedding)
            hidden_states.append(x)
            x = block(in_dim, f"down{index}_block2")(x, None, time_embedding)
            x = attn(full_attn[index], f"down{index}_attention")(x) + x
            hidden_states.append(x)
            if is_last:
                x = nn.Conv(out_dim, (3, 3), padding=1, name=f"down{index}_conv")(x)
            else:
                x = Downsample(out_dim, name=f"down{index}_downsample")(x)

        x = block(dims[-1], "middle_block_1")(x, None, time_embedding)
        x = attn(True, "middle_attention")(x) + x
        x = block(dims[-1], "middle_block_2")(x, None, time_embedding)

        for index, (in_dim, out_dim) in enumerate(reversed(pairs)):
            is_last = index == self.num_stages - 1
            x = jnp.concatenate([x, hidden_states.pop()], axis=-1)
            x = block(out_dim, f"up{index}_block1")(x, None, time_embedding)
            x = jnp.concatenate([x, hidden_states.pop()], axis=-1)
            x = block(out_dim, f"up{index}_block2")(x, None, time_embedding)
            x = attn(full_attn[-(index + 1)], f"up{index}_attention")(x) + x
            if is_last:
                x = nn.Conv(in_dim, (3, 3), padding=1, name=f"up{index}_conv")(x)
            else:
                x = Upsample(in_dim, name=f"up{index}_upsample")(x)

        x = jnp.concatenate([x, residual], axis=-1)
        x = block(dims[0], "final_resnet")(x, None, time_embedding)
        x = nn.Conv(final_dim, (1, 1), name="final_conv")(x)
        return amax_normalize(x)
