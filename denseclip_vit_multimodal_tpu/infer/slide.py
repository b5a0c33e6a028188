"""Batched sliding-window inference: gather -> batched forward -> scatter-add.

The reference's slide inference lived in mmseg and is broken in-repo; only
its spec survives — crop 640x640, stride 426x426
(reference: segmentation/configs/denseclip_fpn_vit-b_640x640_80k.py:50,
test.py drives mmseg's slide path).  mmseg's implementation loops windows on
the host, one forward per window, accumulating in a host tensor.

TPU-native design (BASELINE.md north star): the window grid is STATIC for a
given (image size, crop, stride), so the whole pipeline compiles into one
XLA program with zero host round-trips:

  1. gather all windows of all images into one [B*n_win, ch, cw, 3] batch
     (static slices — XLA fuses them into the convolution's input stream);
  2. ONE batched forward over every window — the ViT sees a big, uniform
     batch, exactly what keeps the MXU fed; windows come back at head
     resolution and the (linear) upsample to crop size is deferred;
  3. overlap-add as a STATIC STRIP DECOMPOSITION: window boundaries are
     compile-time constants, so the output canvas partitions into strips
     whose contributing windows are known at trace time — each strip is a
     sum of static slices, assembled with two concatenates.  No
     read-modify-write canvas loop (a dynamic_update_slice chain serializes
     and pays a canvas-sized copy per window — measured ~4 ms/frame).

The count map is a compile-time constant (same for every image), so the
normalization is one fused multiply.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from denseclip_vit_multimodal_tpu.models.layers import resize_bilinear


def window_origins(size: int, crop: int, stride: int) -> List[int]:
    """Window start offsets covering `size` (last window clamped flush)."""
    if size <= crop:
        return [0]
    n = int(np.ceil((size - crop) / stride)) + 1
    return [min(i * stride, size - crop) for i in range(n)]


def slide_grid(
    hw: Tuple[int, int], crop: Tuple[int, int], stride: Tuple[int, int]
) -> List[Tuple[int, int]]:
    ys = window_origins(hw[0], crop[0], stride[0])
    xs = window_origins(hw[1], crop[1], stride[1])
    return [(y, x) for y in ys for x in xs]


def count_map(
    hw: Tuple[int, int], crop: Tuple[int, int], stride: Tuple[int, int]
) -> np.ndarray:
    """[H, W] float32 window-coverage counts (compile-time constant)."""
    cnt = np.zeros(hw, np.float32)
    for y, x in slide_grid(hw, crop, stride):
        cnt[y : y + crop[0], x : x + crop[1]] += 1.0
    assert (cnt > 0).all(), "slide grid leaves uncovered pixels"
    return cnt


def slide_inference(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,  # [B, H, W, 3] preprocessed
    num_outputs: int,
    crop: Tuple[int, int] = (640, 640),
    stride: Tuple[int, int] = (426, 426),
    window_batch: int = 0,
    window_sharding=None,
) -> jnp.ndarray:
    """Slide `forward` (window [N,ch,cw,3] -> logits [N,h',w',K]) over image.

    Returns [B, H, W, num_outputs] averaged logits.  `window_batch` > 0
    chunks the window batch through `lax.map` to bound peak memory for very
    large frames; 0 runs all windows in one forward.

    `forward` may return logits at any resolution: head-resolution outputs
    (model `resize_outputs=False`) have their (linear) upsample to the crop
    size fused into the scatter loop below, instead of materializing
    full-crop fp32 logits for every window up front — ~1 GB less HBM traffic
    per 1024x2048 frame at the reference 640/426 grid.  The upsample itself
    is identical to the model's own (`resize_bilinear` on fp32), so the
    result is bit-comparable with the resize-in-model path.

    `window_sharding` (a `jax.sharding.NamedSharding` over the flat window
    batch, e.g. `P("data")`) spreads the windows of a SINGLE frame across
    the mesh — the reference's DDP can only shard whole images, so one
    latency-critical frame saturates one GPU; here the batched forward is
    SPMD over windows and XLA gathers the logits for the overlap-add.
    """
    b, h, w, _ = image.shape
    # Clamp the crop to the frame: JAX slicing would silently TRUNCATE each
    # window while the head-res logits still upsample to the full crop and
    # get top-sliced — geometrically wrong output with no error.  A crop
    # covering the whole axis degrades to one window on that axis, matching
    # mmseg's behavior and Inferencer's own clamping.
    ch, cw = min(crop[0], h), min(crop[1], w)
    crop = (ch, cw)
    grid = slide_grid((h, w), crop, stride)
    n_win = len(grid)

    # 1. gather (static slices)
    windows = jnp.stack(
        [image[:, y : y + ch, x : x + cw, :] for (y, x) in grid], axis=1
    )  # [B, n_win, ch, cw, 3]
    flat = windows.reshape(b * n_win, ch, cw, -1)

    if window_sharding is not None:
        flat = jax.lax.with_sharding_constraint(flat, window_sharding)

    # 2. batched forward (logits may come back at head resolution)
    if window_batch and window_batch < b * n_win:
        total = b * n_win
        pad = (-total) % window_batch
        padded = jnp.concatenate([flat, flat[: pad]], axis=0) if pad else flat
        chunks = padded.reshape(-1, window_batch, ch, cw, flat.shape[-1])
        logits = jax.lax.map(forward, chunks)
        logits = logits.reshape((-1,) + logits.shape[2:])[:total]
    else:
        logits = forward(flat)
    lh, lw = logits.shape[1:3]
    logits = logits.reshape(b, n_win, lh, lw, num_outputs).astype(jnp.float32)
    ups = [
        resize_bilinear(logits[:, i], (ch, cw))
        if (lh, lw) != (ch, cw)
        else logits[:, i]
        for i in range(n_win)
    ]

    # 3. overlap-add as a static strip decomposition + normalize by the
    # constant coverage map.  A dynamic_update_slice read-modify-write loop
    # over the [B, H, W, K] fp32 canvas serializes 10 window updates and
    # costs a canvas-sized copy each (measured ~4 ms of the 42 ms frame at
    # the reference 640/426 grid).  Window boundaries are static, so the
    # canvas partitions into strips whose contributing windows are known at
    # trace time: every strip is a SUM of static slices — pure gather,
    # written exactly once, no serialization.
    def segments(origins: Sequence[int], crop_sz: int, size: int) -> List[Tuple[int, int]]:
        bounds = sorted(
            {0, size}
            | {o for o in origins}
            | {min(o + crop_sz, size) for o in origins}
        )
        return list(zip(bounds[:-1], bounds[1:]))

    row_parts = []
    for y0, y1 in segments([g[0] for g in grid], ch, h):
        col_parts = []
        for x0, x1 in segments([g[1] for g in grid], cw, w):
            acc = None
            for i, (wy, wx) in enumerate(grid):
                if wy <= y0 and y1 <= wy + ch and wx <= x0 and x1 <= wx + cw:
                    piece = ups[i][:, y0 - wy : y1 - wy, x0 - wx : x1 - wx, :]
                    acc = piece if acc is None else acc + piece
            assert acc is not None, "slide grid leaves uncovered pixels"
            col_parts.append(acc)
        row_parts.append(jnp.concatenate(col_parts, axis=2))
    canvas = jnp.concatenate(row_parts, axis=1)
    inv_cnt = jnp.asarray(1.0 / count_map((h, w), crop, stride))[None, :, :, None]
    return canvas * inv_cnt
