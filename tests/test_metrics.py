"""Metric math vs numpy reference implementations.

Contracts: confusion-matrix mIoU/accuracy
(reference: segmentation/denseclip/utils.py:109-139) and the depth error
suite (reference: segmentation/utils/depth_metrics.py:12-88).
"""

import numpy as np

from denseclip_vit_multimodal_tpu.train.metrics import (
    accuracy_from_confusion,
    confusion_matrix,
    depth_errors,
    finalize_depth_errors,
    miou_from_confusion,
)


def _np_confusion(preds, labels, k, ignore=255):
    cm = np.zeros((k, k), np.float64)
    valid = labels != ignore
    for t, p in zip(labels[valid].ravel(), preds[valid].ravel()):
        cm[t, p] += 1
    return cm


def test_confusion_matrix(rng):
    k = 5
    labels = rng.randint(0, k, size=(2, 16, 16))
    labels[0, :4] = 255
    preds = rng.randint(0, k, size=(2, 16, 16))
    cm = np.asarray(confusion_matrix(preds, labels, k))
    np.testing.assert_allclose(cm, _np_confusion(preds, labels, k))


def test_miou_and_accuracy(rng):
    k = 4
    labels = rng.randint(0, k, size=(8, 8))
    preds = labels.copy()
    preds[0] = (preds[0] + 1) % k  # corrupt one row
    cm = confusion_matrix(preds, labels, k)
    miou, iou = miou_from_confusion(cm)
    acc = accuracy_from_confusion(cm)

    np_cm = _np_confusion(preds, labels, k)
    inter = np.diag(np_cm)
    union = np_cm.sum(0) + np_cm.sum(1) - inter
    np_iou = inter / (union + 1e-8)
    np.testing.assert_allclose(np.asarray(iou), np_iou, rtol=1e-6)
    np.testing.assert_allclose(float(acc), inter.sum() / np_cm.sum(), rtol=1e-6)
    present = union > 0
    np.testing.assert_allclose(
        float(miou), np_iou[present].mean(), rtol=1e-6
    )


def test_perfect_prediction_miou(rng):
    labels = rng.randint(0, 3, size=(8, 8))
    cm = confusion_matrix(labels, labels, 3)
    miou, _ = miou_from_confusion(cm)
    assert abs(float(miou) - 1.0) < 1e-6


def test_depth_errors_vs_numpy(rng):
    gt = np.abs(rng.randn(2, 8, 8)).astype(np.float32) * 20 + 0.5
    pred = gt * (1 + 0.1 * rng.randn(2, 8, 8)).astype(np.float32)
    pred = np.abs(pred) + 1e-3
    mask = rng.rand(2, 8, 8) > 0.2

    sums, count = depth_errors(pred, gt, mask, min_depth=1e-3, max_depth=80.0)
    result = {k: float(v) for k, v in finalize_depth_errors(sums, count).items()}

    eval_mask = mask & (gt >= 1e-3) & (gt <= 80.0)
    g = gt[eval_mask]
    p = np.clip(pred[eval_mask], 1e-3, 80.0)
    thresh = np.maximum(g / p, p / g)
    np.testing.assert_allclose(result["a1"], (thresh < 1.25).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        result["rmse"], np.sqrt(np.mean((g - p) ** 2)), rtol=1e-5
    )
    np.testing.assert_allclose(
        result["rmse_log"],
        np.sqrt(np.mean((np.log(g) - np.log(p)) ** 2)),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        result["abs_rel"], np.mean(np.abs(g - p) / g), rtol=1e-5
    )
    np.testing.assert_allclose(
        result["sq_rel"], np.mean((g - p) ** 2 / g), rtol=1e-5
    )


def test_depth_errors_empty_mask(rng):
    gt = np.ones((1, 4, 4), np.float32)
    pred = np.ones((1, 4, 4), np.float32)
    mask = np.zeros((1, 4, 4), bool)
    sums, count = depth_errors(pred, gt, mask)
    assert float(count) == 0.0
    result = finalize_depth_errors(sums, count)
    assert all(np.isfinite(float(v)) for v in result.values())


def test_batch_aggregation_exact(rng):
    """Sums/count decomposition must equal single-shot computation."""
    gt = np.abs(rng.randn(4, 8, 8)).astype(np.float32) * 10 + 0.5
    pred = np.abs(gt + rng.randn(4, 8, 8).astype(np.float32))
    mask = np.ones((4, 8, 8), bool)

    s_all, c_all = depth_errors(pred, gt, mask)
    s1, c1 = depth_errors(pred[:2], gt[:2], mask[:2])
    s2, c2 = depth_errors(pred[2:], gt[2:], mask[2:])
    merged = {k: float(s1[k]) + float(s2[k]) for k in s1}
    for k in s_all:
        np.testing.assert_allclose(float(s_all[k]), merged[k], rtol=1e-5)
    np.testing.assert_allclose(float(c_all), float(c1) + float(c2))
