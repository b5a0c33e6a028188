"""Prediction visualization: multi-task panels + comparison grids.

Rebuild of the reference's matplotlib/cv2 visualizers
(reference: segmentation/train_denseclip.py:690-843 `visualize_multi_task`,
:846-890 `visualize_comparison`): de-normalize the input, colorize seg with a
palette (JET-like) and depth with MAGMA, lay out a panel grid, save PNG.
Pure host-side (numpy + matplotlib Agg); never touches the device path.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

# Standard Cityscapes train-id palette (19 classes).
CITYSCAPES_PALETTE = np.array(
    [
        [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
        [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
        [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
        [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
        [0, 0, 230], [119, 11, 32],
    ],
    dtype=np.uint8,
)


def denormalize_image(
    image: np.ndarray,
    mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073),
    std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711),
) -> np.ndarray:
    """[H, W, 3] normalized float -> uint8 RGB."""
    img = image * np.asarray(std) + np.asarray(mean)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def colorize_seg(
    seg: np.ndarray,
    palette: Optional[np.ndarray] = None,
    ignore_index: int = 255,
) -> np.ndarray:
    """[H, W] int labels -> [H, W, 3] uint8 (ignore -> black)."""
    palette = CITYSCAPES_PALETTE if palette is None else palette
    out = np.zeros(seg.shape + (3,), np.uint8)
    valid = (seg != ignore_index) & (seg < len(palette)) & (seg >= 0)
    out[valid] = palette[seg[valid]]
    return out


def colorize_depth(
    depth: np.ndarray, max_depth: float = 80.0, cmap: str = "magma"
) -> np.ndarray:
    """[H, W] metric depth -> [H, W, 3] uint8 via a matplotlib colormap."""
    import matplotlib

    norm = np.clip(depth / max_depth, 0.0, 1.0)
    cm = matplotlib.colormaps[cmap]
    rgb = cm(norm)[..., :3]
    rgb[depth <= 0] = 0.0
    return (rgb * 255).astype(np.uint8)


def _colorize_scaled(arr: np.ndarray, cmap: str = "jet") -> np.ndarray:
    """Max-scale an arbitrary 2-D array to [0, 1] and colorize.

    Matches the reference's `pred * 255 / (pred.max() + 1e-6)` +
    cv2.COLORMAP_JET chain (train_denseclip.py:861-866) without cv2:
    values are scaled by the array max (epsilon-guarded), then mapped
    through a matplotlib colormap.
    """
    import matplotlib

    arr = np.asarray(arr, np.float64)
    norm = np.clip(arr / (arr.max() + 1e-6), 0.0, 1.0)
    cm = matplotlib.colormaps[cmap]
    return (cm(norm)[..., :3] * 255).astype(np.uint8)


def save_comparison_panel(
    path: str,
    image: np.ndarray,  # normalized [H, W, 3] or uint8
    pred: np.ndarray,  # [H, W] raw values (labels or depth)
    target: np.ndarray,  # [H, W] raw values
    epoch: Optional[int] = None,
    cmap: str = "jet",
    mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073),
    std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711),
) -> str:
    """Input / prediction / ground-truth side-by-side comparison figure.

    Re-design of the reference's `visualize_comparison`
    (train_denseclip.py:846-890): de-normalize the input, max-scale pred
    and target through a JET colormap, 1x3 grid, suptitle
    "Validation Epoch N - Best Accuracy Image". Pure host-side; failures
    must be caught by the caller (the reference logs and continues).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if image.dtype != np.uint8:
        image = denormalize_image(image, mean, std)

    fig, axes = plt.subplots(1, 3, figsize=(18, 6))
    if epoch is not None:
        fig.suptitle(
            f"Validation Epoch {epoch} - Best Accuracy Image", fontsize=16
        )
    for ax, (name, img) in zip(
        axes,
        [
            ("Input Image", image),
            ("Prediction", _colorize_scaled(pred, cmap)),
            ("Ground Truth", _colorize_scaled(target, cmap)),
        ],
    ):
        ax.imshow(img)
        ax.set_title(name)
        ax.axis("off")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    plt.tight_layout(rect=[0, 0.03, 1, 0.95])
    fig.savefig(path)
    plt.close(fig)
    return path


def save_multi_task_panel(
    path: str,
    image: np.ndarray,  # normalized [H, W, 3] or uint8
    seg_pred: np.ndarray,
    seg_gt: Optional[np.ndarray] = None,
    depth_pred: Optional[np.ndarray] = None,
    depth_gt: Optional[np.ndarray] = None,
    palette: Optional[np.ndarray] = None,
    max_depth: float = 80.0,
    title: str = "",
) -> str:
    """Save an input/prediction/GT panel grid PNG; returns the path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = []
    if image.dtype != np.uint8:
        image = denormalize_image(image)
    panels.append(("input", image))
    panels.append(("seg pred", colorize_seg(seg_pred, palette)))
    if seg_gt is not None:
        panels.append(("seg gt", colorize_seg(seg_gt, palette)))
    if depth_pred is not None:
        panels.append(("depth pred", colorize_depth(depth_pred, max_depth)))
    if depth_gt is not None:
        panels.append(("depth gt", colorize_depth(depth_gt, max_depth)))

    cols = min(3, len(panels))
    rows = (len(panels) + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3 * rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for ax in axes:
        ax.axis("off")
    for ax, (name, img) in zip(axes, panels):
        ax.imshow(img)
        ax.set_title(name, fontsize=9)
    if title:
        fig.suptitle(title, fontsize=11)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path
