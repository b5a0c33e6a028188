"""Feature necks: ViT multi-level fusion + FPN.

  * `ViTFeatureFusionNeck` — re-design of reference models.py:717-782:
    per-level ConvBNReLU(width -> inter, 3x3), channel concat, 1x1
    ConvBNReLU fuse to `out_channels`.  All ViT levels share one spatial
    size, so this is a pure channel-mixing pipeline; on TPU the concat +
    1x1 conv lowers to a single [BHW, L*inter] x [L*inter, out] matmul.
  * `FPN` — torchvision `FeaturePyramidNetwork` semantics
    (reference denseclip.py:264-281): 1x1 laterals, top-down nearest
    upsample + add, 3x3 smoothing convs, optional extra max-pool level.

NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from denseclip_vit_multimodal_tpu.models.layers import ConvBNReLU

Dtype = Any


class ViTFeatureFusionNeck(nn.Module):
    """Fuse same-resolution ViT level maps into one [B, H, W, out] map."""

    num_inputs: int
    out_channels: int
    inter_channels: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        if len(features) != self.num_inputs:
            raise ValueError(
                f"neck expected {self.num_inputs} inputs, got {len(features)}"
            )
        inter = self.inter_channels or self.out_channels
        processed = [
            ConvBNReLU(inter, kernel_size=3, dtype=self.dtype, name=f"process_{i}")(
                feat, train=train
            )
            for i, feat in enumerate(features)
        ]
        fused = jnp.concatenate(processed, axis=-1)
        return ConvBNReLU(
            self.out_channels, kernel_size=1, dtype=self.dtype, name="fuse"
        )(fused, train=train)


class FPN(nn.Module):
    """Feature Pyramid Network (torchvision semantics, NHWC).

    Returns the pyramid finest-first, like torchvision's ordered dict values
    (reference denseclip.py:759-765 consumes output[0] = highest resolution).
    """

    num_inputs: int
    out_channels: int = 256
    num_outs: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray], train: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        if len(features) != self.num_inputs:
            raise ValueError(
                f"FPN expected {self.num_inputs} inputs, got {len(features)}"
            )
        conv = lambda k, name: nn.Conv(
            self.out_channels,
            (k, k),
            padding=[(k // 2, k // 2)] * 2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        laterals = [
            conv(1, f"lateral_{i}")(feat) for i, feat in enumerate(features)
        ]
        # top-down: nearest upsample + add.  torchvision uses
        # F.interpolate(mode="nearest") whose source index is
        # floor(dst * src/dst) — NOT jax.image.resize's half-pixel
        # rounding, which picks different pixels whenever the sizes are
        # not an exact multiple (e.g. odd stage dims) and would shift the
        # whole top-down pathway by one pixel vs reference weights.
        for i in range(len(laterals) - 2, -1, -1):
            src = laterals[i + 1]
            oh, ow = laterals[i].shape[1:3]
            ys = (np.arange(oh) * src.shape[1]) // oh
            xs = (np.arange(ow) * src.shape[2]) // ow
            laterals[i] = laterals[i] + src[:, ys][:, :, xs]
        outs = [
            conv(3, f"output_{i}")(lat) for i, lat in enumerate(laterals)
        ]
        num_outs = self.num_outs or len(outs)
        if num_outs > len(outs) + 1:
            # only ONE extra (LastLevelMaxPool) level can be appended;
            # silently returning fewer levels than requested would surface
            # as an IndexError far from the misconfiguration
            raise ValueError(
                f"FPN num_outs={num_outs} > num_inputs+1={len(outs) + 1}"
            )
        if num_outs > len(outs):
            # LastLevelMaxPool: stride-2 max pool of the coarsest level
            # (reference denseclip.py:271-274).
            extra = nn.max_pool(
                outs[-1], window_shape=(1, 1), strides=(2, 2), padding="VALID"
            )
            outs.append(extra)
        # the guard above + the append cap len(outs) at >= num_outs
        return tuple(outs[:num_outs])
