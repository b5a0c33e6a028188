"""Training losses: ignore-aware cross entropy + masked SILog.

TPU-native rebuild of the reference loss stack:

  * segmentation: `nn.CrossEntropyLoss(ignore_index=255)`
    (reference: segmentation/train_denseclip.py:1086-1087) — mean over valid
    pixels, matching torch's default 'mean' reduction with ignore_index.
  * depth: `SILogLoss` (reference: segmentation/denseclip/losses.py:7-79) —
    scale-invariant log loss  mean(d^2) - lambda * mean(d)^2  over valid
    pixels, eps-clamped logs, returning 0 when the mask is empty.

Everything is `where`-masked (no boolean indexing / `.item()` branches) so
the losses jit cleanly and stay fused with the model's backward pass.
fp32 accumulation regardless of activation dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jnp.ndarray,  # [B, H, W, K] (channel-last)
    labels: jnp.ndarray,  # [B, H, W] int
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Mean CE over pixels whose label != ignore_index; 0 if none valid.

    The picked-logit lookup is a one-hot contraction, NOT take_along_axis:
    a dynamic gather along the minor (channel) axis serializes on TPU —
    measured 134.8 ms vs 2.8 ms for the contraction at [16,512,1024,19]
    on v5e (identical result).  nll = logsumexp - <logits, onehot>.
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    m = jnp.max(logits, axis=-1)
    lse = jnp.log(jnp.sum(jnp.exp(logits - m[..., None]), axis=-1)) + m
    onehot = jax.nn.one_hot(safe_labels, logits.shape[-1], dtype=logits.dtype)
    picked = jnp.sum(logits * onehot, axis=-1)
    nll = jnp.where(valid, lse - picked, 0.0)
    count = jnp.sum(valid)
    return jnp.where(count > 0, jnp.sum(nll) / jnp.maximum(count, 1), 0.0)


def silog_loss(
    prediction: jnp.ndarray,  # [B, H, W] or [B, H, W, 1]
    target: jnp.ndarray,  # same spatial shape
    mask: Optional[jnp.ndarray] = None,  # bool, same spatial shape
    lambd: float = 0.5,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Masked scale-invariant log depth loss (reference losses.py:21-79)."""
    pred = jnp.maximum(prediction.astype(jnp.float32), eps)
    tgt = jnp.maximum(target.astype(jnp.float32), eps)
    if pred.ndim == tgt.ndim + 1:
        pred = pred.squeeze(-1)
    log_diff = jnp.log(pred) - jnp.log(tgt)

    if mask is not None:
        if mask.ndim == log_diff.ndim + 1:
            mask = mask.squeeze(-1)
        mask = mask.astype(bool)
        log_diff = jnp.where(mask, log_diff, 0.0)
        count = jnp.sum(mask).astype(jnp.float32)
    else:
        count = jnp.asarray(float(log_diff.size), jnp.float32)

    safe_count = jnp.maximum(count, 1.0)
    term1 = jnp.sum(jnp.square(log_diff)) / safe_count
    term2 = jnp.square(jnp.sum(log_diff)) / jnp.square(safe_count)
    loss = term1 - lambd * term2
    return jnp.where(count > 0, loss, 0.0)
