"""Fused on-device augmentation: scale+pad+crop+flip+jitter+normalize in jit.

The reference augments on CPU in DataLoader worker processes with
Albumentations: RandomScale(0.5-2.0) -> PadIfNeeded(value=0, mask 255) ->
RandomCrop(crop) -> HFlip(0.5) -> optional ColorJitter -> Normalize(CLIP
stats) -> ToTensor (reference: segmentation/train_denseclip.py:104-172).
That chain materializes a dynamically-shaped intermediate per step — a shape
XLA cannot compile.

TPU-native formulation: the whole geometric chain is ONE static-shape
resampling.  For an output pixel (i, j) of the fixed crop, the chain above is
exactly

    y_src = (i + oy + 0.5) / s - 0.5        (half-pixel, cv2 convention)
    x_src = (j' + ox + 0.5) / s - 0.5       j' = flipped j with prob 0.5

where `s` is the sampled scale and (oy, ox) the sampled crop offset in the
scaled canvas (negative when the scaled image is smaller than the crop ==
centered PadIfNeeded).  Bilinear gather for the image, nearest for seg /
depth, out-of-canvas -> fill (0 image, 255 seg, 0 depth).  One pass over the
source, fixed shapes, batch-vmapped with per-sample PRNG keys; padding pixels
then normalize to (0-mean)/std exactly as the reference's pad-then-Normalize
does.

The depth validity mask is recomputed post-transform as depth > 0, matching
reference cityscapes_depth_seg.py:218.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class AugmentConfig(NamedTuple):
    crop_size: Tuple[int, int] = (512, 1024)
    scale_range: Tuple[float, float] = (0.5, 2.0)
    hflip_prob: float = 0.5
    norm_mean: Tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)
    norm_std: Tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)
    ignore_index: int = 255
    # ColorJitter half-ranges; all-zero disables.  `color_jitter: true` in the
    # data config maps to the reference's A.ColorJitter(0.4, 0.4, 0.4,
    # hue=0.1, p=0.8) (reference train_denseclip.py:150-156).
    brightness: float = 0.0
    contrast: float = 0.0
    saturation: float = 0.0
    hue: float = 0.0
    color_jitter_prob: float = 1.0


def normalize_image(
    image: jnp.ndarray,
    mean: Sequence[float],
    std: Sequence[float],
) -> jnp.ndarray:
    """uint8/float [..., 3] -> CLIP-normalized float32."""
    x = image.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def _sample_geometry(
    key: jax.Array, src_hw: Tuple[int, int], cfg: AugmentConfig
):
    """Sample (scale_y, scale_x, oy, ox, flip) for one image.

    Mimics cv2.resize to ROUNDED integer dims followed by integer-offset
    RandomCrop / centered PadIfNeeded, so crops land on whole pixels exactly
    like the Albumentations chain.
    """
    h, w = src_hw
    ch, cw = cfg.crop_size
    k_scale, k_oy, k_ox, k_flip = jax.random.split(key, 4)
    s = jax.random.uniform(
        k_scale, (), jnp.float32, cfg.scale_range[0], cfg.scale_range[1]
    )
    sh = jnp.round(s * h)
    sw = jnp.round(s * w)

    # Integer crop offset in the scaled canvas.  If the scaled image exceeds
    # the crop, uniform integer in [0, scaled - crop]; otherwise centered
    # padding -> negative offset -floor((crop - scaled)/2).
    def offset(k, scaled, crop):
        span = jnp.maximum(scaled - crop, 0.0)
        u = jax.random.uniform(k, (), jnp.float32, 0.0, 1.0)
        pos = jnp.floor(u * (span + 1.0)).clip(0.0, span)
        neg = -jnp.floor((crop - scaled) / 2.0)
        return jnp.where(scaled >= crop, pos, neg)

    oy = offset(k_oy, sh, float(ch))
    ox = offset(k_ox, sw, float(cw))
    flip = jax.random.bernoulli(k_flip, cfg.hflip_prob)
    return sh / h, sw / w, oy, ox, flip


def _source_coords_1d(
    sy: jnp.ndarray,
    sx: jnp.ndarray,
    oy: jnp.ndarray,
    ox: jnp.ndarray,
    flip: jnp.ndarray,
    crop: Tuple[int, int],
    src_hw: Tuple[int, int],
):
    """Half-pixel source coordinates per output row / column (separable).

    Each output index is either an IMAGE row/col of the scaled canvas
    (canvas position in [0, scaled_extent - 1]) or a PAD row/col.  Image
    coordinates are clamped to [0, src - 1] — cv2.resize samples the edge
    pixel at full weight there, so without the clamp every border row of an
    upscaled image is darkened by the lost tent mass.  Pad positions get a
    far-outside sentinel so both the tent and the one-hot nearest rows are
    exactly zero — without it a pad row adjacent to the image picks up
    bleed from the edge pixel instead of the pure Albumentations fill.
    """
    ch, cw = crop
    h, w = src_hw

    def coords(idx, o, s, n):
        c = idx + o  # position in the scaled canvas (integer-valued)
        src = (c + 0.5) / s - 0.5
        extent = jnp.round(s * n)  # scaled image size, integer-valued
        is_img = (c >= 0.0) & (c <= extent - 1.0)
        return jnp.where(is_img, jnp.clip(src, 0.0, n - 1.0), -2.0)

    i = jnp.arange(ch, dtype=jnp.float32)
    j = jnp.arange(cw, dtype=jnp.float32)
    j = jnp.where(flip, (cw - 1) - j, j)
    return coords(i, oy, sy, h), coords(j, ox, sx, w)


def _source_coords(
    sy: jnp.ndarray,
    sx: jnp.ndarray,
    oy: jnp.ndarray,
    ox: jnp.ndarray,
    flip: jnp.ndarray,
    crop: Tuple[int, int],
    src_hw: Tuple[int, int],
):
    """Half-pixel source coordinates for every output pixel of the crop."""
    ch, cw = crop
    y, x = _source_coords_1d(sy, sx, oy, ox, flip, crop, src_hw)
    return (
        jnp.broadcast_to(y[:, None], (ch, cw)),
        jnp.broadcast_to(x[None, :], (ch, cw)),
    )


def _gather_bilinear(
    img: jnp.ndarray,  # [H, W, C] float32
    y: jnp.ndarray,  # [ch, cw]
    x: jnp.ndarray,
    fill: float,
) -> jnp.ndarray:
    h, w = img.shape[:2]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc]  # gather [ch, cw, C]
        return jnp.where(inside[..., None], vals, fill)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - wx[..., None]) + v01 * wx[..., None]
    bot = v10 * (1 - wx[..., None]) + v11 * wx[..., None]
    return top * (1 - wy[..., None]) + bot * wy[..., None]


def _gather_nearest(
    arr: jnp.ndarray,  # [H, W] any dtype
    y: jnp.ndarray,
    x: jnp.ndarray,
    fill,
) -> jnp.ndarray:
    h, w = arr.shape[:2]
    yn = jnp.round(y)
    xn = jnp.round(x)
    inside = (yn >= 0) & (yn < h) & (xn >= 0) & (xn < w)
    yc = jnp.clip(yn, 0, h - 1).astype(jnp.int32)
    xc = jnp.clip(xn, 0, w - 1).astype(jnp.int32)
    vals = arr[yc, xc]
    return jnp.where(inside, vals, jnp.asarray(fill, arr.dtype))


def _interp_matrices(
    y: jnp.ndarray,  # [ch] source y coord per output row
    x: jnp.ndarray,  # [cw] source x coord per output col
    src_hw: Tuple[int, int],
):
    """Separable resampling matrices.

    Gathers are slow on TPU (the VPU serializes them); the same bilinear /
    nearest resample is two dense matmuls on the MXU:

        out = Wy @ src @ Wx^T        Wy: [ch, H], Wx: [cw, W]

    Bilinear rows are the tent kernel max(0, 1-|src-s|); out-of-canvas
    coordinates produce all-zero rows == the albumentations zero/ignore fill.
    Nearest rows are one-hot at round(src).  Construction is a broadcasted
    iota comparison — pure VPU, no gather anywhere.
    """
    h, w = src_hw
    sy = jnp.arange(h, dtype=jnp.float32)[None, :]  # [1, H]
    sx = jnp.arange(w, dtype=jnp.float32)[None, :]
    wy_lin = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - sy))  # [ch, H]
    wx_lin = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - sx))  # [cw, W]
    wy_nn = (jnp.round(y)[:, None] == sy).astype(jnp.float32)
    wx_nn = (jnp.round(x)[:, None] == sx).astype(jnp.float32)
    return wy_lin, wx_lin, wy_nn, wx_nn


def _resample_bilinear_mm(img: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray):
    """[H, W, C] x [ch, H] x [cw, W] -> [ch, cw, C] via two MXU contractions."""
    tmp = jnp.einsum("oh,hwc->owc", wy, img.astype(jnp.float32))
    return jnp.einsum("pw,owc->opc", wx, tmp)


def _resample_nearest_mm(arr: jnp.ndarray, wy_nn, wx_nn, fill):
    """Nearest resample of [H, W] via one-hot matmuls; empty rows -> fill."""
    vals = _resample_bilinear_mm(arr.astype(jnp.float32)[..., None], wy_nn, wx_nn)[..., 0]
    inside = (wy_nn.sum(-1) > 0)[:, None] & (wx_nn.sum(-1) > 0)[None, :]
    vals = jnp.where(inside, vals, jnp.asarray(fill, jnp.float32))
    return vals.astype(arr.dtype) if jnp.issubdtype(arr.dtype, jnp.floating) else jnp.round(vals).astype(arr.dtype)


def _rgb_to_hsv(rgb: jnp.ndarray):
    """[..., 3] RGB in [0, 1] -> (h, s, v), h in [0, 1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    delta = maxc - minc
    safe = jnp.maximum(delta, 1e-12)
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, maxc


def _hsv_to_rgb(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    idx = i.astype(jnp.int32) % 6
    sel = [idx == k for k in range(6)]
    r = jnp.select(sel, [v, q, p, p, t, v])
    g = jnp.select(sel, [t, v, v, q, p, p])
    b = jnp.select(sel, [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


_GRAY_WEIGHTS = (0.299, 0.587, 0.114)  # ITU-R 601, torchvision rgb_to_grayscale


def _gray(img: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray(_GRAY_WEIGHTS, jnp.float32)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _color_jitter(
    key: jax.Array, img: jnp.ndarray, cfg: AugmentConfig
) -> jnp.ndarray:
    """ColorJitter on [0, 255] float RGB with torchvision/albumentations
    semantics (reference train_denseclip.py:150-156: A.ColorJitter(0.4, 0.4,
    0.4, hue=0.1, p=0.8)):

      * factors uniform in [max(0, 1-x), 1+x]; hue offset uniform [-hue, hue];
      * contrast/saturation blend against the ITU-R 601 grayscale (mean for
        contrast, per-pixel for saturation);
      * the four ops are applied in RANDOM order;
      * the whole jitter fires with probability `color_jitter_prob`.

    Static no-op when every range is zero (keeps the common path trace-free).
    """
    if not (cfg.brightness or cfg.contrast or cfg.saturation or cfg.hue):
        return img
    kb, kc, ks, kh, k_order, k_apply = jax.random.split(key, 6)

    def factor(k, half):
        return jax.random.uniform(
            k, (), jnp.float32, max(0.0, 1.0 - half), 1.0 + half
        )

    fb = factor(kb, cfg.brightness)
    fc = factor(kc, cfg.contrast)
    fs = factor(ks, cfg.saturation)
    fh = jax.random.uniform(kh, (), jnp.float32, -cfg.hue, cfg.hue)

    def brightness(x):
        return jnp.clip(x * fb, 0.0, 255.0)

    def contrast(x):
        m = jnp.mean(_gray(x))
        return jnp.clip(fc * x + (1.0 - fc) * m, 0.0, 255.0)

    def saturation(x):
        return jnp.clip(fs * x + (1.0 - fs) * _gray(x), 0.0, 255.0)

    def hue(x):
        h, s, v = _rgb_to_hsv(x / 255.0)
        return _hsv_to_rgb((h + fh) % 1.0, s, v) * 255.0

    ops = (brightness, contrast, saturation, hue)
    perm = jax.random.permutation(k_order, len(ops))

    def body(t, x):
        return jax.lax.switch(perm[t], ops, x)

    jittered = jax.lax.fori_loop(0, len(ops), body, img)
    apply = jax.random.bernoulli(k_apply, cfg.color_jitter_prob)
    return jnp.where(apply, jittered, img)


def augment_sample(
    key: jax.Array,
    image: jnp.ndarray,  # [H, W, 3] uint8/float
    seg: Optional[jnp.ndarray],  # [H, W] int
    depth: Optional[jnp.ndarray],  # [H, W] float
    cfg: AugmentConfig,
    use_matmul_resample: bool = True,
) -> Dict[str, jnp.ndarray]:
    """One sample through the fused train-augmentation chain.

    Two equivalent resamplers: the matmul form (default — separable tent /
    one-hot interpolation matrices contracted on the MXU) and a gather form
    (kept for cross-validation; gathers serialize on the VPU and are ~10x
    slower at Cityscapes sizes).
    """
    src_hw = (image.shape[0], image.shape[1])
    k_geom, k_color = jax.random.split(key)
    sy, sx, oy, ox, flip = _sample_geometry(k_geom, src_hw, cfg)

    out: Dict[str, jnp.ndarray] = {}
    if use_matmul_resample:
        y, x = _source_coords_1d(sy, sx, oy, ox, flip, cfg.crop_size, src_hw)
        wy_lin, wx_lin, wy_nn, wx_nn = _interp_matrices(y, x, src_hw)
        img = _resample_bilinear_mm(image.astype(jnp.float32), wy_lin, wx_lin)
        if seg is not None:
            out["seg"] = _resample_nearest_mm(
                seg.astype(jnp.int32), wy_nn, wx_nn, cfg.ignore_index
            )
        if depth is not None:
            d = _resample_nearest_mm(
                depth.astype(jnp.float32), wy_nn, wx_nn, 0.0
            )
            out["depth"] = d
            out["depth_mask"] = d > 0.0
    else:
        y, x = _source_coords(sy, sx, oy, ox, flip, cfg.crop_size, src_hw)
        img = _gather_bilinear(image.astype(jnp.float32), y, x, fill=0.0)
        if seg is not None:
            out["seg"] = _gather_nearest(
                seg, y, x, cfg.ignore_index
            ).astype(jnp.int32)
        if depth is not None:
            d = _gather_nearest(depth, y, x, 0.0).astype(jnp.float32)
            out["depth"] = d
            out["depth_mask"] = d > 0.0

    img = _color_jitter(k_color, img, cfg)
    out["image"] = normalize_image(img, cfg.norm_mean, cfg.norm_std)
    return out


def augment_batch(
    key: jax.Array,
    batch: Dict[str, jnp.ndarray],
    cfg: AugmentConfig,
    use_matmul_resample: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Batched fused augmentation (vmap over per-sample keys).

    batch keys: 'image' [B,H,W,3]; optional 'seg' [B,H,W], 'depth' [B,H,W].
    """
    b = batch["image"].shape[0]
    keys = jax.random.split(key, b)
    seg = batch.get("seg")
    depth = batch.get("depth")

    def one(k, img, sg, dp):
        return augment_sample(k, img, sg, dp, cfg, use_matmul_resample)

    in_axes = (0, 0, 0 if seg is not None else None, 0 if depth is not None else None)
    return jax.vmap(one, in_axes=in_axes)(keys, batch["image"], seg, depth)


def eval_preprocess_batch(
    batch: Dict[str, jnp.ndarray],
    cfg: AugmentConfig,
    resize_to_crop: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Validation path: optional resize to crop size + normalize.

    Mirrors the reference val transform Resize(crop) -> Normalize
    (train_denseclip.py:160-172).  Labels/depth stay at native resolution —
    the trainer resizes predictions back to GT before scoring, exactly like
    the reference (train_denseclip.py:462-467).
    """
    img = batch["image"].astype(jnp.float32)
    if resize_to_crop and img.shape[1:3] != tuple(cfg.crop_size):
        ch, cw = cfg.crop_size
        img = jax.image.resize(
            img, (img.shape[0], ch, cw, img.shape[3]), method="bilinear"
        )
    out = dict(batch)
    out["image"] = normalize_image(img, cfg.norm_mean, cfg.norm_std)
    if "depth" in batch:
        out["depth_mask"] = batch["depth"] > 0.0
    return out


def augment_config_from_data_cfg(data_cfg, train: bool = True) -> AugmentConfig:
    """Build an AugmentConfig from the `data:` config section."""
    get = data_cfg.get if hasattr(data_cfg, "get") else lambda k, d=None: d
    aug = get("augment", {}) or {}
    aug_get = aug.get if hasattr(aug, "get") else lambda k, d=None: d
    # `color_jitter: true` switches on the reference defaults
    # A.ColorJitter(brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1,
    # p=0.8) (train_denseclip.py:150-156); explicit augment.* keys override.
    cj = bool(get("color_jitter", False)) and train
    return AugmentConfig(
        crop_size=tuple(get("crop_size", (512, 1024))),
        scale_range=tuple(get("scale_range", (0.5, 2.0))),
        hflip_prob=float(aug_get("hflip_prob", 0.5)) if train else 0.0,
        norm_mean=tuple(get("norm_mean", AugmentConfig().norm_mean)),
        norm_std=tuple(get("norm_std", AugmentConfig().norm_std)),
        ignore_index=int(get("ignore_label", 255)),
        brightness=float(aug_get("brightness", 0.4 if cj else 0.0)) if train else 0.0,
        contrast=float(aug_get("contrast", 0.4 if cj else 0.0)) if train else 0.0,
        saturation=float(aug_get("saturation", 0.4 if cj else 0.0)) if train else 0.0,
        hue=float(aug_get("hue", 0.1 if cj else 0.0)) if train else 0.0,
        color_jitter_prob=float(aug_get("color_jitter_prob", 0.8 if cj else 1.0)),
    )
