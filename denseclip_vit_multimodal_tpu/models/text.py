"""CLIP text towers: standard encoder + prompt-learning context encoder.

Re-design of the reference text encoders
(reference: segmentation/denseclip/models.py:600-714 and 785-864):

  * `CLIPTextEncoder` — token embed -> pos embed -> causal transformer ->
    ln_final -> EOT-token feature @ text_projection (models.py:695-714).
  * `CLIPTextContextEncoder` — the DenseCLIP prompt-learning tower
    (models.py:844-864): learnable context tokens are spliced between the
    SOT token and the class-name tokens, the EOT index shifts by the number
    of context tokens, and the causal transformer runs over [B*K, N1+N2, C].

Single-pass transformer semantics (the reference's stack double-applies its
blocks via a bug at models.py:305-307; we implement CLIP's intended math —
see SURVEY.md §7).  The EOT gather uses one-hot contraction instead of
dynamic indexing so the whole tower stays a static XLA program.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from denseclip_vit_multimodal_tpu.models.layers import (
    ATTN_XLA,
    LayerNorm,
    Transformer,
)

Dtype = Any


def _gather_eot(x: jnp.ndarray, eot_index: jnp.ndarray) -> jnp.ndarray:
    """x: [B, N, C], eot_index: [B] -> [B, C] via one-hot matmul (MXU-friendly)."""
    onehot = jax.nn.one_hot(eot_index, x.shape[1], dtype=x.dtype)
    return jnp.einsum("bn,bnc->bc", onehot, x)


class CLIPTextEncoder(nn.Module):
    """Standard CLIP text tower -> [K, embed_dim]."""

    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    embed_dim: int = 512
    attn_impl: str = ATTN_XLA
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """text: int tokens [K, N] (N == context_length) -> [K, embed_dim]."""
        k, n = text.shape
        x = nn.Embed(
            self.vocab_size,
            self.transformer_width,
            embedding_init=nn.initializers.normal(stddev=0.02),
            param_dtype=jnp.float32,
            name="token_embedding",
        )(text).astype(self.dtype)

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.transformer_width),
            jnp.float32,
        )
        # Truncate like the reference if the input is shorter (models.py:698-703).
        x = x + pos[:n].astype(self.dtype)[None]

        x, _ = Transformer(
            width=self.transformer_width,
            layers=self.transformer_layers,
            heads=self.transformer_heads,
            causal=True,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="transformer",
        )(x, deterministic=deterministic)
        x = LayerNorm(name="ln_final")(x)

        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.transformer_width**-0.5),
            (self.transformer_width, self.embed_dim),
            jnp.float32,
        )
        eot = _gather_eot(x.astype(jnp.float32), jnp.argmax(text, axis=-1))
        return eot @ text_projection


class CLIPTextContextEncoder(nn.Module):
    """Prompt-learning text tower: splices learnable context tokens.

    `context_length` is the TOTAL internal capacity N1+N2 (e.g. 22 = 6 fixed
    class-name tokens + 16 learned context vectors,
    configs/denseclip_cityscapes.yaml:22,41).
    """

    context_length: int = 22
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    embed_dim: int = 512
    attn_impl: str = ATTN_XLA
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,
        context: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """text: [K, N1] int tokens; context: [B, N2, C] -> [B, K, embed_dim].

        Mirrors reference models.py:844-864: sequence = [SOT, context..., rest
        of class tokens], EOT index = argmax(text) + N2.
        """
        k, n1 = text.shape
        b, n2, c = context.shape
        assert c == self.transformer_width, (c, self.transformer_width)
        assert n1 + n2 == self.context_length, (n1, n2, self.context_length)

        x_text = nn.Embed(
            self.vocab_size,
            self.transformer_width,
            embedding_init=nn.initializers.normal(stddev=0.02),
            param_dtype=jnp.float32,
            name="token_embedding",
        )(text).astype(self.dtype)  # [K, N1, C]

        x_text = jnp.broadcast_to(x_text[None], (b, k, n1, c))
        ctx = jnp.broadcast_to(
            context.astype(self.dtype)[:, None], (b, k, n2, c)
        )
        seq = jnp.concatenate(
            [x_text[:, :, :1], ctx, x_text[:, :, 1:]], axis=2
        ).reshape(b * k, n1 + n2, c)

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.transformer_width),
            jnp.float32,
        )
        seq = seq + pos.astype(self.dtype)[None]

        seq, _ = Transformer(
            width=self.transformer_width,
            layers=self.transformer_layers,
            heads=self.transformer_heads,
            causal=True,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="transformer",
        )(seq, deterministic=deterministic)
        seq = LayerNorm(name="ln_final")(seq)

        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.transformer_width**-0.5),
            (self.transformer_width, self.embed_dim),
            jnp.float32,
        )
        eot_index = jnp.argmax(text, axis=-1) + n2  # [K]
        eot_index = jnp.broadcast_to(eot_index[None], (b, k)).reshape(-1)
        eot = _gather_eot(seq.astype(jnp.float32), eot_index)
        out = eot @ text_projection
        return out.reshape(b, k, self.embed_dim)
