"""Synthetic dataset: structured random Cityscapes-like samples.

No reference equivalent (the reference has no test data strategy at all,
SURVEY.md §4); this backs smoke tests, benchmarks, and the driver's dry-run
paths without any data on disk.  Samples are deterministic in (seed, idx).
"""

from __future__ import annotations


from typing import Tuple

import numpy as np


class SyntheticDataset:
    """Random image / seg / (optional) depth triplets at a fixed size."""

    def __init__(
        self,
        length: int = 64,
        image_size: Tuple[int, int] = (1024, 2048),
        num_classes: int = 19,
        with_depth: bool = True,
        depth_max: float = 80.0,
        seed: int = 0,
        ignore_index: int = 255,
    ):
        self.length = length
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        self.with_depth = with_depth
        self.depth_max = depth_max
        self.seed = seed
        self.ignore_index = ignore_index

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int):
        if not 0 <= idx < self.length:
            raise IndexError(idx)
        rng = np.random.RandomState(self.seed * 100003 + idx)
        h, w = self.image_size
        # Blocky structure so downscaled labels stay self-consistent.
        bh, bw = max(h // 32, 1), max(w // 32, 1)
        img_small = rng.randint(0, 256, (bh, bw, 3), dtype=np.uint8)
        seg_small = rng.randint(0, self.num_classes, (bh, bw)).astype(np.uint8)
        image = np.kron(img_small, np.ones((32, 32, 1), dtype=np.uint8))[:h, :w]
        seg = np.kron(seg_small, np.ones((32, 32), dtype=np.uint8))[:h, :w]
        # Sprinkle ignore pixels like real gtFine borders.
        seg[rng.rand(h, w) < 0.02] = self.ignore_index
        sample = {"image": image, "seg": seg}
        if self.with_depth:
            depth_small = rng.uniform(1.0, self.depth_max, (bh, bw)).astype(
                np.float32
            )
            depth = np.kron(depth_small, np.ones((32, 32), dtype=np.float32))[
                :h, :w
            ]
            depth[rng.rand(h, w) < 0.1] = 0.0  # invalid holes
            sample["depth"] = depth
        return sample
