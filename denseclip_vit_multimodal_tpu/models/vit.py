"""CLIP Vision Transformer backbone, TPU-first.

Re-design of the reference `CLIPVisionTransformer`
(reference: segmentation/denseclip/models.py:378-597):

  * patch embedding as reshape + one [P*P*3, width] matmul (the k=s=patch
    conv is exactly a linear map per patch; a single big matmul feeds the MXU
    directly instead of a strided conv, models.py:407,546-548),
  * class token + learned positional embedding, bilinearly interpolated to
    the input grid as in models.py:514-540 (grid size is static per compile:
    one XLA program per input resolution),
  * pre-LN, scan-compiled transformer stack with per-block taps; `ln_post`
    is applied only to the final block's tap (models.py:563-583),
  * `out_indices` selects which block outputs are returned as NHWC spatial
    maps [B, H/P, W/P, width] (CLS token dropped, models.py:578-581).

The CLIP projection (`proj`) is kept as a parameter for checkpoint parity but
is not used in the dense forward (models.py:428-430 defines it only to match
checkpoint keys).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from denseclip_vit_multimodal_tpu.models.layers import (
    ATTN_AUTO,
    LayerNorm,
    Transformer,
)

Dtype = Any


class CLIPVisionTransformer(nn.Module):
    """ViT backbone returning spatial feature maps at `out_indices`.

    Attributes mirror the reference config schema
    (configs/denseclip_cityscapes.yaml:33-42).
    """

    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    input_resolution: int = 224  # resolution the pos-embed grid was trained at
    output_dim: int = 768  # kept for config parity; dense output dim == width
    out_indices: Sequence[int] = (11,)
    drop_path_rate: float = 0.0
    clip_proj_dim: int = 512
    attn_impl: str = ATTN_AUTO
    dtype: Dtype = jnp.float32
    remat: Any = False  # false | true/"full" | "attn" | "attn_qkv" | "dots"
    pad_sequence_to_lanes: bool = True  # pad-once + masked attention

    @property
    def base_grid(self) -> int:
        return self.input_resolution // self.patch_size

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        """x: NHWC image [B, H, W, 3] -> tuple of [B, H/P, W/P, width] maps."""
        b, h, w, c = x.shape
        p = self.patch_size
        assert h % p == 0 and w % p == 0, f"input {h}x{w} not divisible by patch {p}"
        gh, gw = h // p, w // p

        # --- patch embedding: [B, gh, p, gw, p, C] -> [B, gh*gw, p*p*C] @ W ---
        patches = x.reshape(b, gh, p, gw, p, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        scale = self.width**-0.5
        patch_kernel = self.param(
            "patch_embed",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (p * p * c, self.width),
            jnp.float32,
        )
        tokens = jnp.dot(
            patches.astype(self.dtype),
            patch_kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)

        # --- class token + positional embedding ---
        class_embed = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=scale),
            (self.width,),
            jnp.float32,
        )
        cls = jnp.broadcast_to(
            class_embed.astype(self.dtype)[None, None, :], (b, 1, self.width)
        )
        seq = jnp.concatenate([cls, tokens], axis=1)  # [B, 1+N, width]

        pos_embed = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=scale),
            (self.base_grid**2 + 1, self.width),
            jnp.float32,
        )
        pos = interpolate_pos_embed(pos_embed, self.base_grid, (gh, gw))
        seq = seq + pos.astype(self.dtype)[None]

        # --- transformer with taps ---
        seq = LayerNorm(name="ln_pre")(seq).astype(self.dtype)
        # Pad-once: align the sequence to the 128-lane boundary here instead
        # of copy-padding q/k/v inside the attention kernel EVERY layer
        # (saves 12x3 pad copies per forward).  Pad keys are masked via
        # `valid_len` in every attention impl; pad rows ride the residual
        # stream harmlessly and are sliced off below.
        n_tokens = seq.shape[1]
        valid_len = None
        if (
            self.pad_sequence_to_lanes
            and n_tokens >= 1024
            and n_tokens % 128 != 0
        ):
            n_padded = -(-n_tokens // 128) * 128
            seq = jnp.pad(seq, ((0, 0), (0, n_padded - n_tokens), (0, 0)))
            valid_len = n_tokens
        _, taps = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            causal=False,
            drop_path_rate=self.drop_path_rate,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            remat=self.remat,
            name="transformer",
        )(seq, deterministic=deterministic, valid_len=valid_len)
        if valid_len is not None:
            taps = taps[:, :, :n_tokens, :]
        # taps: [layers, B, 1+N, width]

        ln_post = LayerNorm(name="ln_post")
        # Parameter kept for CLIP checkpoint parity; unused in the dense path.
        self.param(
            "proj",
            nn.initializers.normal(stddev=scale),
            (self.width, self.clip_proj_dim),
            jnp.float32,
        )

        out = []
        last = self.layers - 1
        for idx in sorted(set(int(i) for i in self.out_indices)):
            if not 0 <= idx < self.layers:
                raise ValueError(f"out_index {idx} out of range for {self.layers} layers")
            feat = taps[idx]
            if idx == last:
                feat = ln_post(feat).astype(self.dtype)
            spatial = feat[:, 1:, :].reshape(b, gh, gw, self.width)
            out.append(spatial)
        return tuple(out)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, base_grid: int, grid: Tuple[int, int]
) -> jnp.ndarray:
    """Bilinearly resample a [1+G*G, D] pos-embed to a (gh, gw) grid.

    Matches the reference's `interpolate_pos_encoding` (models.py:514-540):
    the CLS entry passes through; the spatial entries are resized with
    align_corners=False bilinear.  Grid sizes are static, so this folds into
    the compiled program (a constant when the params are donated).
    """
    gh, gw = grid
    if gh == base_grid and gw == base_grid:
        return pos_embed
    cls_pos = pos_embed[:1]
    spatial = pos_embed[1:].reshape(base_grid, base_grid, -1)
    resized = jax.image.resize(
        spatial, (gh, gw, spatial.shape[-1]), method="bilinear"
    )
    return jnp.concatenate([cls_pos, resized.reshape(gh * gw, -1)], axis=0)
