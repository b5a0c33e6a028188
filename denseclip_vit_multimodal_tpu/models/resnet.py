"""CLIP-style anti-aliased ResNet backbones (NHWC).

Re-design of the reference ResNet visual towers
(reference: segmentation/denseclip/models.py:70-239):

  * `Bottleneck` — CLIP's anti-aliased bottleneck: all convs stride 1, an
    AvgPool(stride) sits before conv3 on the residual path and before the
    1x1 conv on the downsample path (models.py:70-105).
  * `CLIPResNet` — 3-conv stem (first conv stride 2) + avg-pool, four stages
    returning the 4 stage maps (models.py:150-182).
  * `CLIPResNetWithAttention` — same trunk plus `AttentionPool2d`
    (models.py:107-148, 184-239): mean-token query QKV attention over the
    stage-4 map with a learned positional embedding (bilinearly resized to
    the runtime grid — fixing the reference's latent `self.spacial_dim`
    crash at models.py:125 by construction).  Returns the 4 stage maps, the
    attention-pooled feature map, and the (global, local) pair is folded
    into the map/global outputs.

Returned feature maps are NHWC: [B, H/s, W/s, C].
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from denseclip_vit_multimodal_tpu.models.layers import attention_core

Dtype = Any


def _avg_pool(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    return nn.avg_pool(
        x, window_shape=(stride, stride), strides=(stride, stride), padding="VALID"
    )


class Bottleneck(nn.Module):
    """Anti-aliased bottleneck (expansion 4)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    EXPANSION = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = lambda feats, k, name: nn.Conv(
            feats,
            (k, k),
            padding=[(k // 2, k // 2)] * 2,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        out_planes = self.planes * self.EXPANSION

        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = bn("bn3")(conv(out_planes, 1, "conv3")(out))

        identity = x
        if self.stride > 1 or x.shape[-1] != out_planes:
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = bn("downsample_bn")(
                conv(out_planes, 1, "downsample_conv")(identity)
            )
        return nn.relu(out + identity)


class _Stem(nn.Module):
    """3-conv stem + 2x2 avg pool (reference models.py:153-156,176)."""

    width: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        x = nn.Conv(
            self.width // 2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(
            self.width // 2, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv2",
        )(x)
        x = nn.relu(bn("bn2")(x))
        x = nn.Conv(
            self.width, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv3",
        )(x)
        x = nn.relu(bn("bn3")(x))
        return _avg_pool(x, 2)


class _Stage(nn.Module):
    blocks: int
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Bottleneck(self.planes, self.stride, dtype=self.dtype, name="block0")(
            x, train=train
        )
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, dtype=self.dtype, name=f"block{i}")(
                x, train=train
            )
        return x


class CLIPResNet(nn.Module):
    """4-stage CLIP ResNet trunk -> (c1, c2, c3, c4) NHWC maps."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        train = not deterministic
        x = _Stem(self.width, dtype=self.dtype, name="stem")(x, train=train)
        outs = []
        for i, (blocks, mult, stride) in enumerate(
            zip(self.layers, (1, 2, 4, 8), (1, 2, 2, 2))
        ):
            x = _Stage(
                blocks, self.width * mult, stride, dtype=self.dtype, name=f"layer{i + 1}"
            )(x, train=train)
            outs.append(x)
        return tuple(outs)


class AttentionPool2d(nn.Module):
    """CLIP attention pooling returning (global, feature_map).

    Mean token as query prepend + QKV MHA with learned positional embedding;
    the pos-embed is resized to the runtime grid (reference models.py:107-148;
    the reference's unstored `spacial_dim` bug is fixed by construction).
    """

    spacial_dim: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = jnp.concatenate([jnp.mean(seq, axis=1, keepdims=True), seq], axis=1)

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=c**-0.5),
            (self.spacial_dim**2 + 1, c),
            jnp.float32,
        )
        # same cls+spatial resampling the ViT uses (one implementation)
        from denseclip_vit_multimodal_tpu.models.vit import interpolate_pos_embed

        pos = interpolate_pos_embed(pos, self.spacial_dim, (h, w))
        seq = seq + pos.astype(seq.dtype)[None]

        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense(c, "q_proj")(seq)
        k = dense(c, "k_proj")(seq)
        v = dense(c, "v_proj")(seq)
        head_dim = c // self.num_heads
        n = seq.shape[1]
        out = attention_core(
            q.reshape(b, n, self.num_heads, head_dim),
            k.reshape(b, n, self.num_heads, head_dim),
            v.reshape(b, n, self.num_heads, head_dim),
            causal=False,
            impl="xla",
        ).reshape(b, n, c)
        out = dense(self.output_dim, "c_proj")(out)
        global_feat = out[:, 0]
        feature_map = out[:, 1:].reshape(b, h, w, self.output_dim)
        return global_feat, feature_map


class CLIPResNetWithAttention(nn.Module):
    """ResNet trunk + attention pool.

    Returns (c1, c2, c3, c4, attnpool_map): the reference appends the pooled
    spatial map after the 4 stage outputs and then a [global, local] pair
    (models.py:229-239); downstream only ever consumes the last *spatial*
    map, so we return the maps tuple and expose the global feature via
    `sow` ('intermediates', 'attnpool_global') for parity checks.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    input_resolution: int = 224
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        train = not deterministic
        x = _Stem(self.width, dtype=self.dtype, name="stem")(x, train=train)
        outs = []
        for i, (blocks, mult, stride) in enumerate(
            zip(self.layers, (1, 2, 4, 8), (1, 2, 2, 2))
        ):
            x = _Stage(
                blocks, self.width * mult, stride, dtype=self.dtype, name=f"layer{i + 1}"
            )(x, train=train)
            outs.append(x)
        global_feat, local_map = AttentionPool2d(
            spacial_dim=self.input_resolution // 32,
            num_heads=32,
            output_dim=self.output_dim,
            dtype=self.dtype,
            name="attnpool",
        )(outs[-1])
        self.sow("intermediates", "attnpool_global", global_feat)
        # Stage maps (c1..c4) then the attention-pooled local map; the
        # composite model's `feats[-1]` convention picks the pooled map, like
        # the reference's x[-1] after its nested-pair quirk is unwrapped.
        return tuple(outs) + (local_map,)
