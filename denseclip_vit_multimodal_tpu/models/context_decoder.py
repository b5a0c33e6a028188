"""Visual-to-text context decoder (cross-attention refiner).

Re-design of the reference `ContextDecoder` + `TransformerDecoderLayer` +
einsum `Attention` (reference: segmentation/denseclip/models.py:311-375,
867-917).  Per layer: pre-LN self-attention over the K text queries, pre-LN
cross-attention into the visual memory, pre-LN MLP (standard GELU).  The
q/k/v projections carry no bias (models.py:319-321, qkv_bias=False default);
the output projection does.  The module returns a *delta* which the caller
fuses as ``text + gamma * delta`` (denseclip.py:661-666).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from denseclip_vit_multimodal_tpu.models.layers import (
    ATTN_XLA,
    MultiHeadAttention,
)

Dtype = Any


class _DecoderLayer(nn.Module):
    """Pre-LN self-attn + cross-attn + MLP (reference models.py:346-375)."""

    heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, memory: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        attn = lambda name: MultiHeadAttention(
            num_heads=self.heads,
            use_qkv_bias=False,
            attn_impl=ATTN_XLA,  # K is tiny (19 classes); flash buys nothing
            dtype=self.dtype,
            name=name,
        )
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        q = nn.LayerNorm(name="norm1", param_dtype=jnp.float32)(x)
        x = x + drop(attn("self_attn")(q))
        q = nn.LayerNorm(name="norm2", param_dtype=jnp.float32)(x)
        x = x + drop(attn("cross_attn")(q, kv=memory))
        h = nn.LayerNorm(name="norm3", param_dtype=jnp.float32)(x)
        h = nn.Dense(4 * x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = drop(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32, name="mlp_proj")(h)
        return x + drop(h)


class ContextDecoder(nn.Module):
    """Refines text embeddings with visual context; returns the delta.

    Config schema mirrors the reference (models.py:867-874):
    transformer_width/heads/layers, visual_dim, dropout.
    """

    transformer_width: int = 256
    transformer_heads: int = 4
    transformer_layers: int = 6
    visual_dim: int = 1024
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,  # [B, K, visual_dim]
        visual: jnp.ndarray,  # [B, 1+HW, visual_dim]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        w = self.transformer_width
        mem = nn.LayerNorm(name="memory_ln_in", param_dtype=jnp.float32)(visual)
        mem = nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32, name="memory_proj")(mem)
        mem = nn.LayerNorm(name="memory_ln_out", param_dtype=jnp.float32)(mem)

        x = nn.LayerNorm(name="text_ln", param_dtype=jnp.float32)(text)
        x = nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32, name="text_proj")(x)

        for i in range(self.transformer_layers):
            x = _DecoderLayer(
                heads=self.transformer_heads,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, mem, deterministic=deterministic)

        x = nn.LayerNorm(name="out_ln", param_dtype=jnp.float32)(x)
        return nn.Dense(
            self.visual_dim, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj"
        )(x)
