"""Host data loader: threaded decode, static-shape batches, device prefetch.

Replaces the reference's torch DataLoader + DistributedSampler +
None-filtering collate (reference: segmentation/train_denseclip.py:175-289)
with a TPU-native design:

  * decode threads (PNG decode releases the GIL in PIL) instead of worker
    processes — the heavy augmentation math moved on-device (data/augment.py),
    so the host only decodes and stacks;
  * failed samples are RESAMPLED (next index) instead of dropped, keeping
    every batch at the static shape XLA compiled for (the reference's
    None-collate yields ragged batch sizes, train_denseclip.py:246-262);
  * per-process sharding: each JAX process reads its own slice of the epoch
    permutation (rank-strided, same semantics as DistributedSampler with
    `drop_last=True`);
  * double-buffered device prefetch: the next batch's H2D copy overlaps with
    the current step's compute (`jax.device_put` with a NamedSharding is
    async).
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
from typing import Any, Dict, Iterator, Optional

import numpy as np

try:  # jax is optional at import time so pure-host tests stay cheap
    import jax
except Exception:  # pragma: no cover
    jax = None


def _stack_batch(samples) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class DataLoader:
    """Epoch-based loader over a map-style dataset returning dict samples."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_threads: int = 8,
        drop_last: bool = True,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.drop_last = drop_last
        if process_index is None:
            process_index = jax.process_index() if jax is not None else 0
        if process_count is None:
            process_count = jax.process_count() if jax is not None else 1
        self.process_index = process_index
        self.process_count = process_count

    def _per_process_count(self) -> int:
        # ceil(n / world): every process sees the SAME count (a short tail
        # is padded by wrapping, DistributedSampler semantics — reference
        # train_denseclip.py:242-243).  Unequal per-rank counts would leave
        # one process inside a collective train step the others never enter.
        return -(-len(self.dataset) // self.process_count)

    def __len__(self) -> int:
        n = self._per_process_count()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            # Epoch-seeded permutation == reference sampler.set_epoch
            # (train_denseclip.py:1164).
            order = np.random.RandomState(self.seed + epoch).permutation(n)
        else:
            order = np.arange(n)
        total = self._per_process_count() * self.process_count
        if total > n:
            # TILE the permutation out to `total` (np.resize repeats) — a
            # single wrap of at most n extras is not enough when
            # process_count exceeds ~2n (tiny smoke datasets on a pod) and
            # would leave some ranks with zero samples, stranding the
            # others inside a collective step.
            order = np.resize(order, total)
        return order[self.process_index :: self.process_count]

    def _fetch(self, idx: int) -> Dict[str, np.ndarray]:
        n = len(self.dataset)
        for attempt in range(16):
            sample = self.dataset[(idx + attempt) % n]
            if sample is not None:
                return sample
        raise RuntimeError(
            f"16 consecutive decode failures starting at index {idx}"
        )

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield stacked host batches for one epoch, decoding in threads."""
        indices = self._epoch_indices(epoch)
        nb = len(indices) // self.batch_size
        if not self.drop_last and len(indices) % self.batch_size:
            nb += 1
        with cf.ThreadPoolExecutor(self.num_threads) as pool:
            # Keep ~2 batches of decodes in flight.
            window = collections.deque()
            cursor = 0

            def submit_batch(b):
                lo = b * self.batch_size
                hi = min(lo + self.batch_size, len(indices))
                return [pool.submit(self._fetch, int(i)) for i in indices[lo:hi]]

            while cursor < min(2, nb):
                window.append(submit_batch(cursor))
                cursor += 1
            while window:
                futures = window.popleft()
                if cursor < nb:
                    window.append(submit_batch(cursor))
                    cursor += 1
                yield _stack_batch([f.result() for f in futures])


def device_prefetch(
    host_batches: Iterator[Dict[str, np.ndarray]],
    mesh=None,
    size: int = 2,
) -> Iterator[Any]:
    """Overlap H2D transfer with compute: keep `size` batches on device.

    With a mesh, batches are put batch-sharded over the data axis
    (parallel/mesh.py `shard_batch`); otherwise committed to the default
    device.  device_put is async, so enqueueing ahead pipelines the copies.
    """
    from denseclip_vit_multimodal_tpu.parallel.mesh import shard_batch

    queue = collections.deque()

    def put(batch):
        if mesh is not None:
            return shard_batch(batch, mesh)
        return jax.device_put(batch)

    for batch in host_batches:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def build_dataset(data_cfg, split: str):
    """Dataset dispatch on `data.dataset_type` (reference
    train_denseclip.py:185-239), plus the synthetic backend."""
    get = data_cfg.get if hasattr(data_cfg, "get") else dict(data_cfg).get
    dtype_name = get("dataset_type", "CityscapesDepthSegDataset")
    root = get("path", "data/cityscapes")
    if dtype_name == "SyntheticDataset" or get("synthetic", False):
        from denseclip_vit_multimodal_tpu.data.synthetic import SyntheticDataset

        syn = get("synthetic_options", {}) or {}
        syn_get = syn.get if hasattr(syn, "get") else dict(syn).get
        # Synthetic samples must mirror the REAL dataset type's shape:
        # seg-only types get no fabricated depth (generating full-res depth
        # per sample is pure waste on the host), and the label space follows
        # the type's class count unless `classes` overrides it.
        seg_only = dtype_name in ("CityscapesDataset", "ADE20KSegmentation",
                                  "ADE20K")
        default_classes = 150 if "ADE20K" in dtype_name else 19
        return SyntheticDataset(
            length=int(syn_get("length", 64)),
            image_size=tuple(syn_get("image_size", (512, 1024))),
            num_classes=int(get("classes", default_classes)),
            with_depth=not seg_only and bool(syn_get("with_depth", True)),
            depth_max=float(get("depth_max", 80.0)),
            seed=int(syn_get("seed", 0)) + (0 if split == "train" else 7919),
            learnable=bool(syn_get("learnable", False)),
        )
    if dtype_name == "CityscapesDepthSegDataset":
        from denseclip_vit_multimodal_tpu.data.cityscapes import (
            CityscapesDepthSegDataset,
        )

        return CityscapesDepthSegDataset(
            root, split=split, depth_max=float(get("depth_max", 80.0))
        )
    if dtype_name == "CityscapesDataset":
        from denseclip_vit_multimodal_tpu.data.cityscapes import CityscapesDataset

        return CityscapesDataset(root, split=split)
    if dtype_name in ("ADE20KSegmentation", "ADE20K"):
        from denseclip_vit_multimodal_tpu.data.ade20k import ADE20KSegmentation

        return ADE20KSegmentation(root, split=split)
    raise ValueError(f"Unsupported dataset_type: {dtype_name}")
