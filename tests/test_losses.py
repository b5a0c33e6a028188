"""Loss math cross-checked against torch (CPU) reference semantics.

Contracts: CE mean-over-valid with ignore_index
(reference: segmentation/train_denseclip.py:1086-1087) and masked SILog
(reference: segmentation/denseclip/losses.py:21-79) including the
empty-mask -> 0.0 edge case.
"""

import numpy as np
import pytest

from denseclip_vit_multimodal_tpu.train.losses import (
    cross_entropy_loss,
    silog_loss,
)

torch = pytest.importorskip("torch")


def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(2, 8, 10, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=(2, 8, 10)).astype(np.int64)
    labels[0, :3] = 255  # ignored region

    ours = float(cross_entropy_loss(logits, labels, ignore_index=255))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels),
        ignore_index=255,
    ).item()
    assert abs(ours - ref) < 5e-5


def test_cross_entropy_all_ignored(rng):
    logits = rng.randn(1, 4, 4, 3).astype(np.float32)
    labels = np.full((1, 4, 4), 255, dtype=np.int64)
    assert float(cross_entropy_loss(logits, labels)) == 0.0


def _silog_torch(pred, target, mask, lambd=0.5, eps=1e-6):
    pred = torch.clamp(torch.from_numpy(pred), min=eps)
    target = torch.clamp(torch.from_numpy(target), min=eps)
    log_diff = torch.log(pred) - torch.log(target)
    mask_t = torch.from_numpy(mask).bool()
    log_diff = torch.where(mask_t, log_diff, torch.zeros_like(log_diff))
    t = mask_t.sum().item()
    if t == 0:
        return 0.0
    term1 = torch.sum(log_diff**2) / t
    term2 = (torch.sum(log_diff) ** 2) / (t**2)
    return (term1 - lambd * term2).item()


def test_silog_matches_reference_math(rng):
    pred = np.abs(rng.randn(2, 6, 6)).astype(np.float32) * 10 + 0.5
    target = np.abs(rng.randn(2, 6, 6)).astype(np.float32) * 10 + 0.5
    mask = rng.rand(2, 6, 6) > 0.3

    ours = float(silog_loss(pred, target, mask))
    ref = _silog_torch(pred, target, mask)
    assert abs(ours - ref) < 5e-5


def test_silog_channel_dim_squeezed(rng):
    pred = np.abs(rng.randn(2, 6, 6, 1)).astype(np.float32) + 0.5
    target = np.abs(rng.randn(2, 6, 6)).astype(np.float32) + 0.5
    mask = np.ones((2, 6, 6), bool)
    ours = float(silog_loss(pred, target, mask))
    ref = _silog_torch(pred.squeeze(-1), target, mask)
    assert abs(ours - ref) < 5e-5


def test_silog_empty_mask_is_zero(rng):
    pred = np.abs(rng.randn(1, 4, 4)).astype(np.float32) + 0.5
    target = np.abs(rng.randn(1, 4, 4)).astype(np.float32) + 0.5
    mask = np.zeros((1, 4, 4), bool)
    assert float(silog_loss(pred, target, mask)) == 0.0
    assert np.isfinite(float(silog_loss(pred, target, mask)))


def test_silog_no_mask(rng):
    pred = np.abs(rng.randn(1, 4, 4)).astype(np.float32) + 0.5
    target = np.abs(rng.randn(1, 4, 4)).astype(np.float32) + 0.5
    ours = float(silog_loss(pred, target, None))
    ref = _silog_torch(pred, target, np.ones((1, 4, 4), bool))
    assert abs(ours - ref) < 5e-5
