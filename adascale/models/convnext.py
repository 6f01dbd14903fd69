"""ConvNeXt multi-scale backbone, NHWC-native Flax implementation.

Re-designed from the behavior of the reference backbone
(/root/reference/vkit_open_model/model/convnext.py:20-235): a 4-stage
ConvNeXt that returns the four stage feature maps at strides /4, /8, /16, /32
(or /2.. with a 2x2 stem). The PyTorch original permutes NCHW<->NHWC around
every LayerNorm/Linear (helper.py:76-93); here the whole network is natively
NHWC so those permutes do not exist, and the dw-conv + LN + MLP block is a
single XLA fusion region.

Block semantics preserved exactly (convnext.py:20-59):
  dwconv7x7 -> LN(eps 1e-6) -> 1x1 (4x expand) -> GELU(exact) -> 1x1
  -> * layer_scale (init 1e-6) -> stochastic depth (linearly scheduled
  0.1 * layer_idx / last_idx, convnext.py:76) -> residual add.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch ``nn.GELU()`` default (helper.py:100-101);
    jax's default is the tanh approximation, which breaks 1e-3 parity."""
    return jax.nn.gelu(x, approximate=False)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference convnext.py:41-53): bernoulli
    keep mask over the batch dim, scaled by 1/keep_prob in train mode."""

    prob_bypass: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.prob_bypass == 0.0:
            return x
        keep_prob = 1.0 - self.prob_bypass
        rng = self.make_rng("drop_path")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep_prob, shape=shape)
        return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))


class ConvNeXtBlockLayer(nn.Module):
    """One ConvNeXt residual layer (reference convnext.py:20-59)."""

    channels: int
    prob_bypass: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.channels
        y = nn.Conv(
            features=c,
            kernel_size=(7, 7),
            padding=3,
            feature_group_count=c,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(y)
        y = nn.Dense(4 * c, kernel_init=trunc_normal_init, dtype=self.dtype, name="mlp_up")(y)
        y = gelu_exact(y)
        y = nn.Dense(c, kernel_init=trunc_normal_init, dtype=self.dtype, name="mlp_down")(y)
        scale = self.param(
            "block_scale", nn.initializers.constant(1e-6), (c,), jnp.float32
        )
        # The residual STREAM stays f32 even under bf16 compute: with the
        # reference's layer-scale init of 1e-6 (convnext.py:38) the block
        # contribution is ~1e-5 of the carry, far below bf16's ~3
        # significant digits — a bf16 residual add rounds it away entirely
        # and training from scratch flatlines (observed on hardware).
        # Convs/matmuls above still run in the module dtype (MXU bf16);
        # flax casts the f32 carry down on entry to each op. No-op at f32.
        y = y.astype(jnp.float32) * scale
        y = DropPath(self.prob_bypass, name="drop_path")(y, deterministic)
        return x.astype(jnp.float32) + y


class ConvNeXtStage(nn.Module):
    """N block layers + LN; emits (feature, downsampled_x) like reference
    ``ConvNextBlock`` (convnext.py:62-101)."""

    channels: int
    num_layers: int
    layer_idx_begin: int
    layer_idx_end: int
    out_channels: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        for layer_idx in range(self.num_layers):
            prob_bypass = 0.1 * (self.layer_idx_begin + layer_idx) / self.layer_idx_end
            x = ConvNeXtBlockLayer(
                channels=self.channels,
                prob_bypass=prob_bypass,
                dtype=self.dtype,
                name=f"layer{layer_idx}",
            )(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)
        feature = x
        if self.out_channels is not None:
            x = nn.Conv(
                features=self.out_channels,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                kernel_init=trunc_normal_init,
                dtype=self.dtype,
                name="downsample",
            )(x)
        return feature, x


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    stem_in_channels: int = 3
    block_channels_and_num_layers: Tuple[Tuple[int, int], ...] = (
        (96, 3),
        (192, 3),
        (384, 9),
        (768, 3),
    )
    stem_use_pconv2x2: bool = False

    @property
    def in_channels_group(self) -> Tuple[int, ...]:
        return tuple(c for c, _ in self.block_channels_and_num_layers)


# Size presets mirror reference convnext.py:176-225.
CONVNEXT_PRESETS = {
    "tiny": ((96, 3), (192, 3), (384, 9), (768, 3)),
    "small": ((96, 3), (192, 3), (384, 27), (768, 3)),
    "base": ((128, 3), (256, 3), (512, 27), (1024, 3)),
    "large": ((192, 3), (384, 3), (768, 27), (1536, 3)),
}


class ConvNeXt(nn.Module):
    """Multi-scale ConvNeXt backbone returning 4 pyramid features
    (reference convnext.py:104-235)."""

    config: ConvNeXtConfig = ConvNeXtConfig()
    dtype: Dtype = jnp.float32

    @classmethod
    def create(cls, size: str, stem_use_pconv2x2: bool = False, dtype: Dtype = jnp.float32):
        return cls(
            config=ConvNeXtConfig(
                block_channels_and_num_layers=CONVNEXT_PRESETS[size],
                stem_use_pconv2x2=stem_use_pconv2x2,
            ),
            dtype=dtype,
        )

    @property
    def in_channels_group(self) -> Tuple[int, ...]:
        return self.config.in_channels_group

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> List[jax.Array]:
        cfg = self.config
        specs = cfg.block_channels_and_num_layers
        stem_k = 2 if cfg.stem_use_pconv2x2 else 4
        x = nn.Conv(
            features=specs[0][0],
            kernel_size=(stem_k, stem_k),
            strides=(stem_k, stem_k),
            padding="VALID",
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="stem_conv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_ln")(x)

        num_layers_sum = sum(n for _, n in specs)
        layer_idx_end = num_layers_sum - 1
        layer_idx_begin = 0

        features: List[jax.Array] = []
        for stage_idx, (channels, num_layers) in enumerate(specs):
            out_channels = specs[stage_idx + 1][0] if stage_idx + 1 < len(specs) else None
            feature, x = ConvNeXtStage(
                channels=channels,
                num_layers=num_layers,
                layer_idx_begin=layer_idx_begin,
                layer_idx_end=layer_idx_end,
                out_channels=out_channels,
                dtype=self.dtype,
                name=f"stage{stage_idx}",
            )(x, deterministic)
            features.append(feature)
            layer_idx_begin += num_layers
        return features
