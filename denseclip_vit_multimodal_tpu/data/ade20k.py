"""ADE20K semantic segmentation dataset (host-side IO only).

Reproduces the reference's observable contract
(reference: segmentation/datasets/ade20k.py):

  * directory layout ``{root}/ADEChallengeData2016/images/{training,validation}``
    with annotations alongside (ade20k.py:44-48);
  * label remap: 0 (background) -> ignore 255, 1..150 -> 0..149
    (ade20k.py:155-167);
  * 150 classes.

Unlike the reference — whose self-contained PIL pipeline normalizes with
ImageNet stats, inconsistent with the CLIP stats used everywhere else
(ade20k.py:178-182), and whose random crop has a height/width typo
(ade20k.py:136) — augmentation and normalization here run on device
(data/augment.py) with config-driven (CLIP) stats, and neither quirk is
reproduced.

Because ADE20K images vary in size, __getitem__ resizes the raw pair to a
fixed canvas (`canvas_size`, default 512x683 ~ the dataset's median aspect)
so batches stack; the on-device random scale/crop then works exactly as for
Cityscapes.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import List, Tuple

import numpy as np

NUM_CLASSES = 150
IGNORE_INDEX = 255

# ADE20K class names (the standard 150-category list used by mmseg-lineage
# configs; the reference relies on mmseg's copy rather than carrying one).
ADE20K_CLASSES: Tuple[str, ...] = (
    "wall", "building", "sky", "floor", "tree", "ceiling", "road", "bed",
    "windowpane", "grass", "cabinet", "sidewalk", "person", "earth", "door",
    "table", "mountain", "plant", "curtain", "chair", "car", "water",
    "painting", "sofa", "shelf", "house", "sea", "mirror", "rug", "field",
    "armchair", "seat", "fence", "desk", "rock", "wardrobe", "lamp",
    "bathtub", "railing", "cushion", "base", "box", "column", "signboard",
    "chest of drawers", "counter", "sand", "sink", "skyscraper", "fireplace",
    "refrigerator", "grandstand", "path", "stairs", "runway", "case",
    "pool table", "pillow", "screen door", "stairway", "river", "bridge",
    "bookcase", "blind", "coffee table", "toilet", "flower", "book", "hill",
    "bench", "countertop", "stove", "palm", "kitchen island", "computer",
    "swivel chair", "boat", "bar", "arcade machine", "hovel", "bus", "towel",
    "light", "truck", "tower", "chandelier", "awning", "streetlight",
    "booth", "television receiver", "airplane", "dirt track", "apparel",
    "pole", "land", "bannister", "escalator", "ottoman", "bottle", "buffet",
    "poster", "stage", "van", "ship", "fountain", "conveyer belt", "canopy",
    "washer", "plaything", "swimming pool", "stool", "barrel", "basket",
    "waterfall", "tent", "bag", "minibike", "cradle", "oven", "ball", "food",
    "step", "tank", "trade name", "microwave", "pot", "animal", "bicycle",
    "lake", "dishwasher", "screen", "blanket", "sculpture", "hood", "sconce",
    "vase", "traffic light", "tray", "ashcan", "fan", "pier", "crt screen",
    "plate", "monitor", "bulletin board", "shower", "radiator", "glass",
    "clock", "flag",
)

assert len(ADE20K_CLASSES) == NUM_CLASSES


def remap_labels(labels: np.ndarray, ignore_index: int = IGNORE_INDEX) -> np.ndarray:
    """0 -> ignore; 1..150 -> 0..149 (reference ade20k.py:155-167)."""
    out = labels.astype(np.int16) - 1
    out[labels == 0] = ignore_index
    return out.astype(np.uint8) if ignore_index < 256 else out


class ADE20KSegmentation:
    """ADE20K dataset returning fixed-canvas uint8 image + trainId mask."""

    CLASSES = ADE20K_CLASSES
    IGNORE_INDEX = IGNORE_INDEX

    def __init__(
        self,
        root: str,
        split: str = "training",
        canvas_size: Tuple[int, int] = (512, 683),
        ignore_index: int = IGNORE_INDEX,
    ):
        if split in ("train", "training"):
            split = "training"
        elif split in ("val", "validation"):
            split = "validation"
        else:
            raise ValueError(f"Unknown ADE20K split: {split}")
        base = osp.join(root, "ADEChallengeData2016")
        self.image_dir = osp.join(base, "images", split)
        self.label_dir = osp.join(base, "annotations", split)
        if not osp.isdir(self.image_dir):
            raise RuntimeError(f"Image directory not found: {self.image_dir}")
        if not osp.isdir(self.label_dir):
            raise RuntimeError(f"Label directory not found: {self.label_dir}")
        self.canvas_size = tuple(canvas_size)
        self.ignore_index = ignore_index

        self.samples: List[Tuple[str, str]] = []
        for filename in sorted(os.listdir(self.image_dir)):
            if not filename.endswith(".jpg"):
                continue
            label_path = osp.join(
                self.label_dir, filename.replace(".jpg", ".png")
            )
            if osp.exists(label_path):
                self.samples.append((osp.join(self.image_dir, filename), label_path))
        if not self.samples:
            raise RuntimeError(f"No samples found under {self.image_dir}")

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        from PIL import Image

        img_path, label_path = self.samples[idx]
        try:
            # Fixed canvas for BOTH splits, labels included: this IS the
            # reference's eval protocol — its val transform is
            # A.Resize(crop_h, crop_w, BILINEAR) over image AND mask
            # (train_denseclip.py:160-166, which even interpolates the
            # mask bilinearly; NEAREST here is the strictly-correct
            # version of the same resize).  Native-resolution scoring
            # would also mean per-image shapes -> one XLA recompile per
            # unique ADE20K size.
            ch, cw = self.canvas_size
            img = Image.open(img_path).convert("RGB").resize(
                (cw, ch), Image.BILINEAR
            )
            label = Image.open(label_path).resize((cw, ch), Image.NEAREST)
            return {
                "image": np.asarray(img, dtype=np.uint8),
                "seg": remap_labels(np.asarray(label), self.ignore_index),
            }
        except Exception:
            return None
