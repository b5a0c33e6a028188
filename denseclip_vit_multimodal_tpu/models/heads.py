"""Decode heads: FCN segmentation / depth heads + identity head.

The reference builds its heads from torchvision's `FCNHead` and then ASSIGNS
an extra `classifier` conv onto the Sequential
(reference: segmentation/denseclip/denseclip.py:305-309, 343-349).  Because
`nn.Module.__setattr__` registers the new conv as a child of the Sequential,
torchvision's `FCNHead(in, channels)` forward becomes:

    Conv3x3(in -> in//4, no bias) -> BN -> ReLU -> Dropout(0.1)
    -> Conv1x1(in//4 -> channels) -> Conv1x1(channels -> num_outputs)

i.e. the "replaced" classifier is actually APPENDED.  We reproduce that exact
 6-op chain (documented quirk) as `FCNHead` with `num_outputs` = num_classes
for segmentation (denseclip.py:305-309) or 1 for depth (denseclip.py:343-349).

NHWC throughout; dropout active only in training.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FCNHead(nn.Module):
    """FCN head matching the reference's appended-classifier chain."""

    in_channels: int
    channels: int
    num_outputs: int
    dropout_ratio: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inter = self.in_channels // 4
        x = nn.Conv(
            inter,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"
            ),
            name="conv0",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn0",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        x = nn.Conv(
            self.channels,
            (1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"
            ),
            name="conv1",
        )(x)
        # The appended classifier; re-initialized Normal(0, 0.01) like the
        # reference's special classifier init (denseclip.py:499-507).
        return nn.Conv(
            self.num_outputs,
            (1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(stddev=0.01),
            name="classifier",
        )(x)


class IdentityHead(nn.Module):
    """Pass-through head (reference heads.py:92-107)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return x
