"""Attention cores: Pallas TPU flash attention with an XLA fallback.

The reference materializes full [B, heads, N, M] score tensors through
`nn.MultiheadAttention` (reference: segmentation/denseclip/models.py:275) and
a hand-rolled einsum MHA (models.py:311-344).  On TPU the O(N^2) memory of an
8k-token full-frame ViT sequence (SURVEY.md §5.7) is what limits whole-image
inference, so the hot path routes through a blockwise flash kernel
(`jax.experimental.pallas.ops.tpu.flash_attention`) whenever shapes allow,
falling back to a fused XLA einsum-softmax otherwise.

Layout convention at this boundary: [B, N, H, Dh] (sequence-major, like the
rest of the model); the Pallas kernel wants [B, H, N, Dh].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 128


@functools.lru_cache()
def _flash_module():
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        return fa
    except ImportError:  # pragma: no cover - env dependent
        return None


@functools.lru_cache()
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def flash_supported(q: jnp.ndarray) -> bool:
    """Whether the Pallas flash kernel can serve this shape on this backend.

    Conservative: requires TPU backend, a kernel module, seq length a
    multiple of the lane-aligned block, and a head dim the MXU tiles well.
    """
    if _flash_module() is None or not _on_tpu():
        return False
    n = q.shape[1]
    head_dim = q.shape[-1]
    return (
        n >= _FLASH_MIN_SEQ
        and n % _FLASH_MIN_SEQ == 0
        and head_dim in (64, 128, 256)
    )


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Blockwise flash attention. q/k/v: [B, N, H, Dh] -> [B, N, H, Dh]."""
    fa = _flash_module()
    if fa is None:
        raise RuntimeError("Pallas flash attention unavailable on this backend")
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    qt = jnp.swapaxes(q, 1, 2)  # [B, H, N, Dh]
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = fa.flash_attention(qt, kt, vt, causal=causal, sm_scale=sm_scale)
    return jnp.swapaxes(out, 1, 2)
