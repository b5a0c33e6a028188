"""Pixel-text score map: fused L2-normalize + contraction.

The DenseCLIP core op (reference: segmentation/denseclip/denseclip.py:670-676):

    score[b, h, w, k] = <visual[b, h, w, :] / |visual|, text[b, k, :] / |text|>

Reference computes two `F.normalize` passes (two extra HBM round trips of the
[B, C, H, W] feature map) and then `einsum('bchw,bkc->bkhw')`.  Here the
normalization folds into the contraction: normalize the (tiny) text matrix,
compute the raw visual-text matmul on the MXU, and scale rows by the visual
inverse norms — one pass over the feature map, one [BHW, C] x [C, K] matmul.

NHWC layout: visual [B, H, W, C], text [B, K, C] -> scores [B, H, W, K].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Match torch F.normalize(p=2): x / max(|x|, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(norm, eps).astype(x.dtype)).astype(x.dtype)


def score_map(visual: jnp.ndarray, text: jnp.ndarray) -> jnp.ndarray:
    """Cosine-similarity score map in fp32.

    Args:
      visual: [B, H, W, C] spatial features (any float dtype).
      text:   [B, K, C] text embeddings.
    Returns:
      [B, H, W, K] fp32 scores in [-1, 1].
    """
    vis = visual.astype(jnp.float32)
    # Normalize the small operand exactly (torch F.normalize semantics, one
    # shared helper); fold the visual normalization into a row scaling of
    # the matmul result (single pass over the big tensor).
    txt_n = l2_normalize(text.astype(jnp.float32))
    raw = jnp.einsum("bhwc,bkc->bhwk", vis, txt_n, preferred_element_type=jnp.float32)
    inv_norm = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(jnp.square(vis), axis=-1, keepdims=True), 1e-24)
    )
    return raw * inv_norm
