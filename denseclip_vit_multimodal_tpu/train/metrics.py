"""On-device evaluation metrics: segmentation mIoU/accuracy + depth suite.

The reference splits metrics across three places: a python-loop confusion
matrix (reference: segmentation/denseclip/utils.py:109-139 — O(N) host loop),
torchmetrics Jaccard/Accuracy/RMSE in the trainer
(train_denseclip.py:347-358, 1139-1148), and an unwired depth-metric library
(segmentation/utils/depth_metrics.py:12-174).  Here everything is a jittable
device computation:

  * `confusion_matrix` — one-hot matmul, runs on the MXU, no host loop;
    accumulated across batches/devices with a plain `+` (psum under pjit).
  * `miou_from_confusion` / `accuracy_from_confusion` — reductions matching
    the reference math (intersection / (union + eps), nanmean over classes).
  * `depth_errors` — AbsRel/SqRel/RMSE/RMSElog/delta<1.25^k with GT-range
    masking + prediction clamping (depth_metrics.py:12-88), returned as
    (sums, count) so batch aggregation is exact.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def confusion_matrix(
    preds: jnp.ndarray,  # [..., H, W] int predictions
    labels: jnp.ndarray,  # [..., H, W] int labels
    num_classes: int,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Returns [num_classes, num_classes] int32 counts (rows=target).

    One-hots come from a broadcast COMPARE, not `eye[idx]` — indexed-gather
    one-hot construction is the same serialized minor-axis gather the CE
    loss fix removed (docs/PERFORMANCE.md "the gather trap"); at 1024x2048
    eval shapes the eye-gather version cost ~10 ms/frame.  bf16 one-hot
    operands (0/1 exact) halve the HBM traffic.  The MXU accumulates in
    fp32, which is exact only below 2^24 per cell, so the pixel axis is
    chunked at 2^24 and partial counts accumulate in int32 — exact for any
    batch size, and cross-batch `+` accumulation stays exact to 2^31 per
    cell (~2e9 pixels of one class; a full Cityscapes val pass is ~1e9
    total).
    """
    valid = labels != ignore_index
    t = jnp.where(valid, labels, 0).reshape(-1)
    p = jnp.where(valid, preds, 0).reshape(-1)
    classes = jnp.arange(num_classes)
    t_onehot = (
        (t[:, None] == classes[None, :]) & valid.reshape(-1)[:, None]
    ).astype(jnp.bfloat16)
    p_onehot = (p[:, None] == classes[None, :]).astype(jnp.bfloat16)
    total = t_onehot.shape[0]
    chunk = 1 << 24
    out = jnp.zeros((num_classes, num_classes), jnp.int32)
    for start in range(0, total, chunk):
        part = jax.lax.dot_general(
            t_onehot[start : start + chunk],
            p_onehot[start : start + chunk],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = out + part.astype(jnp.int32)
    return out


def miou_from_confusion(cm: jnp.ndarray, eps: float = 1e-8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean IoU over classes present in GT or pred, per-class IoU)."""
    cm = cm.astype(jnp.float32)  # counts may be int32; ratios need floats
    intersection = jnp.diag(cm)
    union = cm.sum(0) + cm.sum(1) - intersection
    iou = intersection / (union + eps)
    present = union > 0
    miou = jnp.sum(jnp.where(present, iou, 0.0)) / jnp.maximum(
        jnp.sum(present), 1
    )
    return miou, iou


def accuracy_from_confusion(cm: jnp.ndarray) -> jnp.ndarray:
    cm = cm.astype(jnp.float32)  # int32 cm: .sum() over cells could overflow
    return jnp.trace(cm) / jnp.maximum(cm.sum(), 1.0)


def depth_errors(
    pred: jnp.ndarray,  # [..., H, W] predicted depth
    gt: jnp.ndarray,  # [..., H, W] ground-truth depth
    mask: jnp.ndarray,  # [..., H, W] bool validity
    min_depth: float = 1e-3,
    max_depth: float = 80.0,
    clamp_pred: bool = True,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Per-batch depth error SUMS and valid-pixel COUNT.

    Mirrors reference depth_metrics.py:12-88: evaluation mask = validity mask
    AND gt in [min_depth, max_depth]; predictions clamped to the range.
    Divide sums by count (and sqrt the rmse terms) after aggregation:
      abs_rel = sums['abs_rel']/n;  rmse = sqrt(sums['sq_diff']/n)
      rmse_log = sqrt(sums['sq_log_diff']/n);  a1 = sums['a1']/n  etc.
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    eval_mask = mask.astype(bool) & (gt >= min_depth) & (gt <= max_depth)
    if clamp_pred:
        pred = jnp.clip(pred, min_depth, max_depth)
    safe_gt = jnp.where(eval_mask, gt, 1.0)
    safe_pred = jnp.where(eval_mask, pred, 1.0)

    diff = safe_gt - safe_pred
    log_diff = jnp.log(safe_gt) - jnp.log(safe_pred)
    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)

    m = eval_mask.astype(jnp.float32)
    sums = {
        "abs_rel": jnp.sum(m * jnp.abs(diff) / safe_gt),
        "sq_rel": jnp.sum(m * jnp.square(diff) / safe_gt),
        "sq_diff": jnp.sum(m * jnp.square(diff)),
        "sq_log_diff": jnp.sum(m * jnp.square(log_diff)),
        "a1": jnp.sum(m * (thresh < 1.25)),
        "a2": jnp.sum(m * (thresh < 1.25**2)),
        "a3": jnp.sum(m * (thresh < 1.25**3)),
    }
    return sums, jnp.sum(m)


def finalize_depth_errors(
    sums: Dict[str, jnp.ndarray], count: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    n = jnp.maximum(count, 1.0)
    return {
        "abs_rel": sums["abs_rel"] / n,
        "sq_rel": sums["sq_rel"] / n,
        "rmse": jnp.sqrt(sums["sq_diff"] / n),
        "rmse_log": jnp.sqrt(sums["sq_log_diff"] / n),
        "a1": sums["a1"] / n,
        "a2": sums["a2"] / n,
        "a3": sums["a3"] / n,
    }
