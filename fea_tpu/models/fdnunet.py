"""FDN-UNet model family (flax.linen, NHWC).

The trained architecture of the reference — split encoder / decoder /
auxiliary-range-decoder (model/fdnunetwithaux.py:341-894) — plus the
monolithic attention variant FDNUNet (model/fdnunet.py:381-657) used by
its sampling notebooks.

Channel plan for the default config (input_dim=64, 4 stages):
  stagewise dims [64, 64, 64, 128, 256, 512][:5] -> [64, 64, 128, 256, 512]
  encoder: init conv -> 4 x [2 FDN resblocks + down] -> 2 FDN middle blocks
  decoder: 4 x [2 plain resblocks (skip concat) + up] -> final resblock
           -> 1x1 conv -> amax normalization
  aux: middle flattened -> MLP -> (sigmoid sign head, log head)
"""

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .attention import FullAttention, LinearAttention
from .blocks import (
    AuxiliaryRangePredictor,
    ConditionedResnetBlock,
    ConditionFeatureExtractor,
    Downsample,
    Upsample,
    amax_normalize,
)
from .time_embedding import TimeEmbeddingMLP


def _stage_dims(input_dim: int, initial_dim: Optional[int], num_stages: int):
    initial = initial_dim if initial_dim is not None else input_dim
    return [initial] + [input_dim * (2**i) for i in range(num_stages)]


class FDNUNetEncoder(nn.Module):
    """Down path + middle (fdnunetwithaux.py:341-667). Returns
    (middle, hidden_states x 2*num_stages, residual)."""

    input_dim: int
    initial_dim: Optional[int] = None
    num_stages: int = 4
    num_channels: int = 3
    num_auxiliary_condition_channels: int = 3
    num_condition_channels: Optional[int] = None
    num_groups: int = 8

    @property
    def max_resolution(self):
        return 2 ** (self.num_stages - 1)

    @nn.compact
    def __call__(self, x, x_auxiliary_condition, x_self_condition=None):
        assert all(d % self.max_resolution == 0 for d in x.shape[1:3]), (
            f"spatial dims {x.shape[1:3]} must be divisible by "
            f"{self.max_resolution}"
        )
        dims = _stage_dims(self.input_dim, self.initial_dim, self.num_stages)
        pairs = list(zip(dims[:-1], dims[1:]))

        if self.num_condition_channels is not None:
            if x_self_condition is None:
                x_self_condition = jnp.zeros_like(x)
            x = jnp.concatenate([x, x_self_condition], axis=-1)

        x = nn.Conv(dims[0], (3, 3), padding=1, name="initial_conv")(x)
        residual = x

        features = ConditionFeatureExtractor(
            dims, name="condition_feature_extractor"
        )(x_auxiliary_condition)

        hidden_states = []
        for index, (in_dim, out_dim) in enumerate(pairs):
            is_last = index == self.num_stages - 1
            x = ConditionedResnetBlock(
                in_dim, num_groups=self.num_groups, name=f"down{index}_block1"
            )(x, features[index])
            hidden_states.append(x)
            x = ConditionedResnetBlock(
                in_dim, num_groups=self.num_groups, name=f"down{index}_block2"
            )(x, features[index])
            hidden_states.append(x)
            if is_last:
                x = nn.Conv(out_dim, (3, 3), padding=1, name=f"down{index}_conv")(x)
            else:
                x = Downsample(out_dim, name=f"down{index}_downsample")(x)

        x = ConditionedResnetBlock(
            dims[-1], num_groups=self.num_groups, name="middle_block_1"
        )(x, features[-1])
        x = ConditionedResnetBlock(
            dims[-1], num_groups=self.num_groups, name="middle_block_2"
        )(x, features[-1])

        return x, hidden_states, residual


class FDNUNetDecoder(nn.Module):
    """Up path with skip concatenation and amax output normalization
    (fdnunetwithaux.py:670-802)."""

    input_dim: int
    initial_dim: Optional[int] = None
    final_dim: Optional[int] = None
    num_stages: int = 4
    num_channels: int = 3
    num_condition_channels: Optional[int] = None
    num_groups: int = 8

    @nn.compact
    def __call__(self, x, hidden_states: List[jnp.ndarray], residual):
        dims = _stage_dims(self.input_dim, self.initial_dim, self.num_stages)
        pairs = list(zip(dims[:-1], dims[1:]))
        final_dim = (
            self.final_dim if self.final_dim is not None else self.num_channels
        )

        hidden = list(hidden_states)
        for index, (in_dim, out_dim) in enumerate(reversed(pairs)):
            is_last = index == self.num_stages - 1
            x = jnp.concatenate([x, hidden.pop()], axis=-1)
            x = ConditionedResnetBlock(
                out_dim,
                use_fdn=False,
                num_groups=self.num_groups,
                name=f"up{index}_block1",
            )(x)
            x = jnp.concatenate([x, hidden.pop()], axis=-1)
            x = ConditionedResnetBlock(
                out_dim,
                use_fdn=False,
                num_groups=self.num_groups,
                name=f"up{index}_block2",
            )(x)
            if is_last:
                x = nn.Conv(in_dim, (3, 3), padding=1, name=f"up{index}_conv")(x)
            else:
                x = Upsample(in_dim, name=f"up{index}_upsample")(x)

        x = jnp.concatenate([x, residual], axis=-1)
        x = ConditionedResnetBlock(
            dims[0], use_fdn=False, num_groups=self.num_groups, name="final_resnet"
        )(x)
        x = nn.Conv(final_dim, (1, 1), name="final_conv")(x)
        # amax (signed max, not abs) normalization — a faithful quirk of
        # the reference (fdnunetwithaux.py:800), zero-divisor guarded.
        return amax_normalize(x)


class FDNUNetAuxDecoder(nn.Module):
    """Auxiliary range decoder over middle features
    (fdnunetwithaux.py:805-828)."""

    middle_dim: int
    final_dim: int
    image_height: int
    image_width: int
    hidden_dim: int = 256
    num_layers: int = 3
    num_stages: int = 4

    @nn.compact
    def __call__(self, x):
        return AuxiliaryRangePredictor(
            output_dim=self.final_dim * 2,
            hidden_dim=self.hidden_dim,
            num_layers=self.num_layers,
            name="auxiliary_range_predictor",
        )(x)


def create_models(
    input_dim: int,
    image_height: int,
    image_width: int,
    range_prediction_hidden_dim: int = 256,
    range_prediction_num_layers: int = 3,
    initial_dim: Optional[int] = None,
    final_dim: Optional[int] = None,
    num_stages: int = 4,
    num_channels: int = 3,
    num_auxiliary_condition_channels: int = 3,
    num_condition_channels: Optional[int] = None,
    resnet_num_groups_for_normalization: int = 8,
) -> Tuple[FDNUNetEncoder, FDNUNetDecoder, FDNUNetAuxDecoder]:
    """Wire the three modules with matched dims (fdnunetwithaux.py:831-894)."""
    dims = _stage_dims(input_dim, initial_dim, num_stages)
    encoder = FDNUNetEncoder(
        input_dim=input_dim,
        initial_dim=initial_dim,
        num_stages=num_stages,
        num_channels=num_channels,
        num_auxiliary_condition_channels=num_auxiliary_condition_channels,
        num_condition_channels=num_condition_channels,
        num_groups=resnet_num_groups_for_normalization,
    )
    decoder = FDNUNetDecoder(
        input_dim=input_dim,
        initial_dim=initial_dim,
        final_dim=final_dim,
        num_stages=num_stages,
        num_channels=num_channels,
        num_condition_channels=num_condition_channels,
        num_groups=resnet_num_groups_for_normalization,
    )
    auxiliary = FDNUNetAuxDecoder(
        middle_dim=dims[-1],
        final_dim=final_dim if final_dim is not None else num_channels,
        image_height=image_height,
        image_width=image_width,
        hidden_dim=range_prediction_hidden_dim,
        num_layers=range_prediction_num_layers,
        num_stages=num_stages,
    )
    return encoder, decoder, auxiliary


class FDNUNet(nn.Module):
    """Monolithic FDN-UNet with per-stage attention (model/fdnunet.py:381-657):
    LinearAttention at outer stages, FullAttention at the innermost stage
    and the middle block; optional self-conditioning channel and optional
    time embedding (the diffusion-mode hooks)."""

    input_dim: int
    initial_dim: Optional[int] = None
    final_dim: Optional[int] = None
    num_stages: int = 4
    num_channels: int = 3
    num_auxiliary_condition_channels: int = 3
    num_condition_channels: Optional[int] = None
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
    def __call__(
        self, x, x_auxiliary_condition, x_self_condition=None, time=None
    ):
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

        if self.num_condition_channels is not None:
            if x_self_condition is None:
                x_self_condition = jnp.zeros_like(x)
            x = jnp.concatenate([x, x_self_condition], axis=-1)

        time_embedding = None
        if self.use_time_embedding and time is not None:
            time_embedding = TimeEmbeddingMLP(self.input_dim)(time)

        x = nn.Conv(dims[0], (3, 3), padding=1, name="initial_conv")(x)
        residual = x
        features = ConditionFeatureExtractor(
            dims, name="condition_feature_extractor"
        )(x_auxiliary_condition)

        def attn(use_full, dim, name):
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

        hidden_states = []
        for index, (in_dim, out_dim) in enumerate(pairs):
            is_last = index == self.num_stages - 1
            x = ConditionedResnetBlock(
                in_dim, num_groups=self.num_groups, name=f"down{index}_block1"
            )(x, features[index], time_embedding)
            hidden_states.append(x)
            x = ConditionedResnetBlock(
                in_dim, num_groups=self.num_groups, name=f"down{index}_block2"
            )(x, features[index], time_embedding)
            x = attn(full_attn[index], in_dim, f"down{index}_attention")(x) + x
            hidden_states.append(x)
            if is_last:
                x = nn.Conv(out_dim, (3, 3), padding=1, name=f"down{index}_conv")(x)
            else:
                x = Downsample(out_dim, name=f"down{index}_downsample")(x)

        x = ConditionedResnetBlock(
            dims[-1], num_groups=self.num_groups, name="middle_block_1"
        )(x, features[-1], time_embedding)
        x = attn(True, dims[-1], "middle_attention")(x) + x
        x = ConditionedResnetBlock(
            dims[-1], num_groups=self.num_groups, name="middle_block_2"
        )(x, features[-1], time_embedding)

        for index, (in_dim, out_dim) in enumerate(reversed(pairs)):
            is_last = index == self.num_stages - 1
            x = jnp.concatenate([x, hidden_states.pop()], axis=-1)
            x = ConditionedResnetBlock(
                out_dim,
                use_fdn=False,
                num_groups=self.num_groups,
                name=f"up{index}_block1",
            )(x, None, time_embedding)
            x = jnp.concatenate([x, hidden_states.pop()], axis=-1)
            x = ConditionedResnetBlock(
                out_dim,
                use_fdn=False,
                num_groups=self.num_groups,
                name=f"up{index}_block2",
            )(x, None, time_embedding)
            x = attn(full_attn[-(index + 1)], out_dim, f"up{index}_attention")(x) + x
            if is_last:
                x = nn.Conv(in_dim, (3, 3), padding=1, name=f"up{index}_conv")(x)
            else:
                x = Upsample(in_dim, name=f"up{index}_upsample")(x)

        x = jnp.concatenate([x, residual], axis=-1)
        x = ConditionedResnetBlock(
            dims[0], use_fdn=False, num_groups=self.num_groups, name="final_resnet"
        )(x, None, time_embedding)
        x = nn.Conv(final_dim, (1, 1), name="final_conv")(x)
        return amax_normalize(x)
