"""Cityscapes datasets: seg-only and joint seg+depth (host-side IO).

TPU-native split of responsibilities: the host does only file scanning,
PNG decode, the vectorized labelId->trainId remap, and disparity->depth
conversion; every geometric/photometric augmentation runs fused on device
(data/augment.py) inside the jitted train step.  This replaces the
reference's CPU Albumentations pipeline in DataLoader worker processes
(reference: segmentation/train_denseclip.py:104-172).

Semantics reproduced from the reference:
  * directory layout + triplet scanning: `leftImg8bit/{split}/{city}` with
    `_leftImg8bit.png`, `gtFine` `_gtFine_labelIds.png`, `disparity`
    `_disparity.png` (cityscapes.py:44-67, cityscapes_depth_seg.py:71-110).
  * 34->19 trainId remap table (cityscapes.py:19-21), out-of-range ids ->
    ignore 255 (cityscapes_depth_seg.py:128-136).
  * disparity (uint16) -> depth: scaled = (d - 1) / 256 where d > 0; depth =
    500.0 / scaled where scaled > 1e-3; valid = raw > 0 AND depth <= depth_max;
    invalid pixels carry depth 0.0 (cityscapes_depth_seg.py:19-23, 137-170).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import List, Optional, Sequence, Tuple

import numpy as np

CLASSES: Tuple[str, ...] = (
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train",
    "motorcycle", "bicycle",
)

NUM_CLASSES = len(CLASSES)
IGNORE_INDEX = 255

# labelId (0..33) -> trainId (0..18) or 255.  Reference cityscapes.py:19-21.
ID_TO_TRAIN_ID = np.full(34, IGNORE_INDEX, dtype=np.uint8)
for _label_id, _train_id in {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}.items():
    ID_TO_TRAIN_ID[_label_id] = _train_id

# trainId (0..18) -> labelId: the inverse map, for writing predictions in
# the official Cityscapes submission format (labelId PNGs — the surface
# behind the reference eval CLI's --format-only, test.py:23-28 via mmseg
# format_results).  Ignore/unknown trainIds map to labelId 0 ("unlabeled").
TRAIN_ID_TO_LABEL_ID = np.zeros(256, dtype=np.uint8)
for _label_id in range(len(ID_TO_TRAIN_ID)):
    if ID_TO_TRAIN_ID[_label_id] != IGNORE_INDEX:
        TRAIN_ID_TO_LABEL_ID[ID_TO_TRAIN_ID[_label_id]] = _label_id


def labelids_from_trainids(train_ids: np.ndarray) -> np.ndarray:
    """Vectorized trainId -> labelId (submission format); uint8 out."""
    return TRAIN_ID_TO_LABEL_ID[np.asarray(train_ids, dtype=np.uint8)]


# Disparity->depth constants (reference cityscapes_depth_seg.py:15-23).
BASELINE_FOCAL_LENGTH = 500.0
DEPTH_IGNORE_VALUE = 0.0
DISPARITY_SCALE = 256.0
DISPARITY_OFFSET = 1.0
MIN_DISPARITY_SCALED = 1e-3


def remap_labels(label_ids: np.ndarray) -> np.ndarray:
    """Vectorized labelId -> trainId; ids beyond the table -> ignore.

    Reference `map_labels_fast` (cityscapes.py:79-85).  Uses the native
    single-pass C++ kernel when available (data/_native.py), numpy otherwise.
    """
    if label_ids.dtype == np.uint8:
        from denseclip_vit_multimodal_tpu.data import _native

        native = _native.remap_labels(label_ids, ID_TO_TRAIN_ID, IGNORE_INDEX)
        if native is not None:
            return native
    out = np.full(label_ids.shape, IGNORE_INDEX, dtype=np.uint8)
    in_range = label_ids < len(ID_TO_TRAIN_ID)
    out[in_range] = ID_TO_TRAIN_ID[label_ids[in_range]]
    return out


def disparity_to_depth(
    disparity: np.ndarray, depth_max: float = 80.0, bf: float = BASELINE_FOCAL_LENGTH
) -> Tuple[np.ndarray, np.ndarray]:
    """uint16 disparity map -> (float32 depth, uint8 validity mask).

    Reference `disparity_to_depth` (cityscapes_depth_seg.py:137-170).  Uses
    the fused native kernel when available.
    """
    if disparity.dtype == np.uint16:
        from denseclip_vit_multimodal_tpu.data import _native

        native = _native.disparity_to_depth(
            disparity, depth_max, bf,
            scale=DISPARITY_SCALE, offset=DISPARITY_OFFSET,
            min_scaled=MIN_DISPARITY_SCALED, ignore_value=DEPTH_IGNORE_VALUE,
        )
        if native is not None:
            depth, _ = native
            return depth, (depth > 0).astype(np.uint8)
    disp = disparity.astype(np.float32)
    raw_valid = disp > 0
    scaled = np.where(raw_valid, (disp - DISPARITY_OFFSET) / DISPARITY_SCALE, 0.0)
    usable = scaled > MIN_DISPARITY_SCALED
    depth = np.where(usable, bf / (scaled + 1e-6), DEPTH_IGNORE_VALUE).astype(
        np.float32
    )
    in_range = raw_valid & usable & (depth <= depth_max)
    depth = np.where(in_range, depth, DEPTH_IGNORE_VALUE).astype(np.float32)
    # Validity == positive depth.  (The reference's returned mask counts
    # unusable near-zero disparities as "valid with depth 0", but immediately
    # recomputes the effective mask as depth > 0 post-transform,
    # cityscapes_depth_seg.py:218 — we normalize to the effective semantics.)
    valid = depth > 0.0
    return depth, valid.astype(np.uint8)


def _scan_pairs(
    root: str, split: str, with_disparity: bool
) -> List[Tuple[str, ...]]:
    images_base = osp.join(root, "leftImg8bit", split)
    labels_base = osp.join(root, "gtFine", split)
    disparity_base = osp.join(root, "disparity", split)
    if not osp.isdir(images_base):
        raise RuntimeError(f"Image directory not found: {images_base}")
    if not osp.isdir(labels_base):
        raise RuntimeError(f"Label directory not found: {labels_base}")
    if with_disparity and not osp.isdir(disparity_base):
        raise RuntimeError(f"Disparity directory not found: {disparity_base}")

    samples: List[Tuple[str, ...]] = []
    for city in sorted(os.listdir(images_base)):
        img_dir = osp.join(images_base, city)
        label_dir = osp.join(labels_base, city)
        disp_dir = osp.join(disparity_base, city)
        if not osp.isdir(img_dir) or not osp.isdir(label_dir):
            continue
        if with_disparity and not osp.isdir(disp_dir):
            continue
        for filename in sorted(os.listdir(img_dir)):
            if not filename.endswith("_leftImg8bit.png"):
                continue
            base = filename[: -len("_leftImg8bit.png")]
            img_path = osp.join(img_dir, filename)
            label_path = osp.join(label_dir, f"{base}_gtFine_labelIds.png")
            if not osp.exists(label_path):
                continue
            if with_disparity:
                disp_path = osp.join(disp_dir, f"{base}_disparity.png")
                if not osp.exists(disp_path):
                    continue
                samples.append((img_path, label_path, disp_path))
            else:
                samples.append((img_path, label_path))
    if not samples:
        raise RuntimeError(f"No samples found under {root} split={split}")
    return samples


class CityscapesDataset:
    """Seg-only Cityscapes: raw [H, W, 3] uint8 image + [H, W] uint8 trainIds.

    Augmentation happens on device; __getitem__ returns undistorted full-res
    arrays.  Decode failures return None (the loader filters them, matching
    the reference's None-collate, train_denseclip.py:246-262).
    """

    CLASSES = CLASSES
    IGNORE_INDEX = IGNORE_INDEX

    def __init__(self, root: str, split: str = "train", remap: bool = True):
        self.root = root
        self.split = split
        self.remap = remap
        self.samples = _scan_pairs(root, split, with_disparity=False)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        from PIL import Image

        img_path, label_path = self.samples[idx]
        try:
            img = np.asarray(Image.open(img_path).convert("RGB"), dtype=np.uint8)
            label = np.asarray(Image.open(label_path), dtype=np.uint8)
            if self.remap:
                label = remap_labels(label)
            return {"image": img, "seg": label}
        except Exception:
            return None


class CityscapesDepthSegDataset:
    """Joint seg+depth Cityscapes: image + trainIds + depth + validity mask."""

    CLASSES = CLASSES
    IGNORE_INDEX = IGNORE_INDEX

    def __init__(
        self,
        root: str,
        split: str = "train",
        remap: bool = True,
        depth_max: float = 80.0,
    ):
        self.root = root
        self.split = split
        self.remap = remap
        self.depth_max = depth_max
        self.samples = _scan_pairs(root, split, with_disparity=True)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        from PIL import Image

        img_path, label_path, disp_path = self.samples[idx]
        try:
            img = np.asarray(Image.open(img_path).convert("RGB"), dtype=np.uint8)
            label = np.asarray(Image.open(label_path), dtype=np.uint8)
            if self.remap:
                label = remap_labels(label)
            disparity = np.asarray(Image.open(disp_path))
            depth, _valid = disparity_to_depth(disparity, self.depth_max)
            # The post-augment validity mask is recomputed as depth > 0 on
            # device (reference cityscapes_depth_seg.py:218); only depth ships.
            return {"image": img, "seg": label, "depth": depth}
        except Exception:
            return None
