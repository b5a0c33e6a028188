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

One compiled program per (input shape, mode); an LRU of jitted callables
keyed on static shapes replaces torch's dynamic re-tracing.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from denseclip_vit_multimodal_tpu.data.augment import AugmentConfig, normalize_image
from denseclip_vit_multimodal_tpu.infer.slide import slide_inference


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
        with_depth: bool = True,
    ):
        self.model = model
        self.variables = variables
        self.texts = jnp.asarray(texts)
        self.aug_cfg = aug_cfg or AugmentConfig()
        self.num_classes = num_classes
        self.with_depth = with_depth
        self._jit_cache: Dict = {}

    # --- compiled kernels, cached per static config ---

    def _whole_fn(self):
        key = ("whole",)
        if key not in self._jit_cache:

            def run(variables, image, texts):
                out = self.model.apply(variables, image, texts, train=False)
                return out["seg"], out.get("depth")

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _forward_logits(self, variables, image, texts, mode, crop, stride,
                        window_batch, window_sharding=None):
        """Traceable seg/depth forward for either mode.

        Returns (seg [B, H, W, K] fp32, depth [B, H, W, 1] fp32 or None) at
        the input spatial size.
        """
        if mode == "whole":
            out = self.model.apply(variables, image, texts, train=False)
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
                variables, windows, texts, train=False, resize_outputs=False
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

            def run(variables, image, texts):
                return self._forward_logits(
                    variables, image, texts, "slide", crop, stride,
                    window_batch, window_sharding,
                )

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _aug_view_fn(self, scaled_hw: Tuple[int, int], out_hw: Tuple[int, int],
                     flip: bool, mode: str, crop: Tuple[int, int],
                     stride: Tuple[int, int], window_batch: int):
        """One compiled program per scale: resize -> forward BOTH views (the
        flipped view rides the batch dim, so one forward feeds the MXU 2B
        windows) -> unflip -> upsample to `out_hw` -> sum.  No host round
        trips (reference aug_test loops single views through numpy,
        denseclip.py:1005-1041 + test.py:91-96)."""
        key = ("aug", scaled_hw, out_hw, flip, mode, crop, stride, window_batch)
        if key not in self._jit_cache:

            def run(variables, image0, texts):
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
                    variables, batch, texts, mode, crop, stride, window_batch
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
            cached = (
                variables,
                texts,
                jax.device_put((variables, texts), replicated),
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

    def predict(
        self,
        images: np.ndarray,
        mode: str = "whole",
        crop: Tuple[int, int] = (640, 640),
        stride: Tuple[int, int] = (426, 426),
        window_batch: int = 0,
        preprocessed: bool = False,
        window_sharding=None,
    ) -> Dict[str, np.ndarray]:
        """Forward one batch; returns {'seg_logits', 'seg', 'depth'?}."""
        image = images if preprocessed else self.preprocess(images)
        if mode == "whole":
            seg_logits, depth = self._whole_fn()(
                self.variables, image, self.texts
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
            )(variables, image, texts)
        else:
            raise ValueError(f"Unknown inference mode: {mode}")
        out = {
            "seg_logits": np.asarray(seg_logits, np.float32),
            "seg": np.asarray(jnp.argmax(seg_logits, axis=-1), np.int32),
        }
        if depth is not None:
            out["depth"] = np.asarray(depth, np.float32)[..., 0] if depth.ndim == 4 else np.asarray(depth)
        return out

    def aug_test(
        self,
        images: np.ndarray,
        scales: Sequence[float] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
        flip: bool = True,
        mode: str = "whole",
        crop: Tuple[int, int] = (640, 640),
        stride: Tuple[int, int] = (426, 426),
        window_batch: int = 0,
    ) -> Dict[str, np.ndarray]:
        """Multi-scale + flip test: average fp32 logits at original size
        (reference aug_test, denseclip.py:1005-1041; scale set from
        test.py:91-96).

        Device-side end to end: one compiled program per scale computes both
        flip views in a single forward and returns the already-unflipped,
        upsampled logit sum; scale sums accumulate on device and the host
        fetches ONE final array per output.
        """
        b, h, w, _ = images.shape
        image0 = self.preprocess(images)
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
            )
            seg_sum, depth_sum = fn(self.variables, image0, self.texts)
            acc_seg = seg_sum if acc_seg is None else acc_seg + seg_sum
            if depth_sum is not None:
                acc_depth = (
                    depth_sum if acc_depth is None else acc_depth + depth_sum
                )
            n += 2 if flip else 1

        seg_logits = acc_seg / n
        result = {
            "seg_logits": np.asarray(seg_logits, np.float32),
            "seg": np.asarray(jnp.argmax(seg_logits, axis=-1), np.int32),
        }
        if acc_depth is not None:
            result["depth"] = np.asarray(acc_depth / n, np.float32)[..., 0]
        return result
