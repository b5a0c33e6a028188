"""Attention cores: Pallas TPU flash attention with an XLA fallback.

The reference materializes full [B, heads, N, M] score tensors through
`nn.MultiheadAttention` (reference: segmentation/denseclip/models.py:275) and
a hand-rolled einsum MHA (models.py:311-344).  On TPU that materialization is
the single biggest cost of the ViT forward: for the 640x640 slide window
(N=1601, 10 windows, 12 heads) the fp32 score tensor + softmax costs ~6.5 ms
per layer vs ~3.0 ms for a blockwise Pallas flash kernel (measured on v5e) —
the O(N^2) HBM traffic disappears.

Shape handling: the Pallas kernel wants the sequence padded to its block
size.  We pad N up to a multiple of 512 (block 1024 when the padded length
allows — measured fastest at these shapes) and mask the padding via
`SegmentIds`, so results are exact, not approximate.  Layout at this
boundary is [B, N, H, Dh] (sequence-major, like the rest of the model); the
kernel wants [B, H, N, Dh].

Training note: the kernel has a full custom VJP, but with the frozen-backbone
recipe (reference train_denseclip.py:1037-1047) XLA dead-code-eliminates the
ViT backward entirely, so inference and training both take the cheap path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Below this sequence length the XLA einsum-softmax wins (kernel launch and
# padding overheads dominate); measured crossover is well under 1k tokens.
_FLASH_MIN_SEQ = 1024


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
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _pad_and_block(n: int) -> tuple[int, int]:
    """(padded_len, block): pad to a multiple of 512, block 1024 when even."""
    padded = -(-n // 512) * 512
    block = 1024 if padded % 1024 == 0 else 512
    return padded, min(block, padded)


def flash_supported(q: jnp.ndarray) -> bool:
    """Whether the Pallas flash kernel should serve this shape."""
    if _flash_module() is None or not _on_tpu():
        return False
    n = q.shape[1]
    head_dim = q.shape[-1]
    return n >= _FLASH_MIN_SEQ and head_dim in (64, 128, 256)


# Above this sequence length the one-shot kernel's whole-K/V VMEM residency
# no longer pays off; stream K/V with the bundled blockwise kernel instead.
# 8448 covers full-frame 1024x2048 ViT-B/16 (N=8193: one-shot 4.38 ms vs
# bundled 4.81 ms measured on v5e).
_ONESHOT_MAX_SEQ = 8448


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Pallas attention. q/k/v: [B, N, H, Dh] -> [B, N, H, Dh].  Exact, any N.

    Dispatch: sequences up to _ONESHOT_MAX_SEQ (8448 — covers ViT windows
    AND 8193-token whole frames) use the one-shot kernel (ops/mha_kernel.py
    — measured 2.4 ms vs 3.2 ms bundled at N=1601 on v5e); longer
    sequences stream through the bundled blockwise kernel.
    `valid_len` masks trailing pad keys of an already-padded sequence.
    CONTRACT: output rows [valid_len, N) are UNSPECIFIED — the one-shot
    and XLA paths compute them against masked keys while the bundled
    kernel also masks the pad query rows; callers must slice to
    [:valid_len] (all in-repo callers do).
    """
    if not causal and q.shape[1] <= _ONESHOT_MAX_SEQ:
        from denseclip_vit_multimodal_tpu.ops.mha_kernel import mha_attention

        return mha_attention(q, k, v, sm_scale=sm_scale, valid_len=valid_len)
    fa = _flash_module()
    if fa is None:
        raise RuntimeError("Pallas flash attention unavailable on this backend")
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    b, n, h, d = q.shape
    real_n = valid_len if valid_len is not None else n
    qt = jnp.swapaxes(q, 1, 2)  # [B, H, N, Dh]
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    padded, block = _pad_and_block(n)
    segment_ids = None
    if padded != n or real_n != n:
        pad = padded - n
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        ids = (jnp.arange(padded) < real_n).astype(jnp.int32)
        ids = jnp.broadcast_to(ids[None], (b, padded))
        segment_ids = fa.SegmentIds(q=ids, kv=ids)

    bs = fa.BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = fa.flash_attention(
        qt, kt, vt, segment_ids=segment_ids, causal=causal,
        sm_scale=sm_scale, block_sizes=bs,
    )
    if padded != n:
        out = out[:, :, :n, :]
    return jnp.swapaxes(out, 1, 2)
