"""Serve from a `tools/export.py` bundle — no model-building code needed.

Deployment counterpart of :class:`infer.engine.Inferencer`: loads the
AOT-serialized StableHLO program + weights `.npz` + `meta.json` that
`tools/export.py` wrote and exposes the same `predict` surface the
serving daemon (`infer/server.py::InferenceService`) consumes.  This
closes the export's own promise (tools/export.py:5-8): a serving host
needs only jax + this loader, never flax/the model zoo/the config system.

The exported program is shape- and protocol-specialized (one input size,
one mode, one crop/stride) — `predict` validates every request against
`meta.json` instead of re-tracing, and `aug_test` is rejected (export one
program per scale if multi-scale serving is needed).

No reference equivalent: the reference deploys by importing its training
code (segmentation/denseclip/denseclip.py:938-1041 via mmseg test.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

from denseclip_vit_multimodal_tpu.infer.engine import package_outputs


class ExportedInferencer:
    """Inferencer-compatible wrapper over an export directory.

    Duck-types the subset of :class:`Inferencer` that
    :class:`InferenceService` uses: `num_classes`, `with_depth`,
    `predict(images, mode=..., crop=..., stride=..., window_batch=...,
    fetch=...)`.
    """

    def __init__(self, export_dir: str):
        from jax import export as jexport
        import jax.numpy as jnp

        with open(os.path.join(export_dir, "meta.json")) as f:
            self.meta = json.load(f)
        with open(os.path.join(export_dir, "program.bin"), "rb") as f:
            self._program = jexport.deserialize(f.read())
        weights = np.load(os.path.join(export_dir, "weights.npz"))
        self._flat = [jnp.asarray(weights[k]) for k in self.meta["weight_keys"]]

        self.export_dir = export_dir
        self.num_classes = len(self.meta["class_names"])
        # Older exports (pre round-5) lack with_depth/fetch keys; derive.
        self.with_depth = bool(
            self.meta.get("with_depth",
                          self.meta["num_outputs"] > self.num_classes)
        )
        self.export_fetch = self.meta.get("fetch", "logits")
        self.input_shape = tuple(self.meta["input_shape"])
        self.mode = self.meta["mode"]
        self.crop = tuple(self.meta["crop"])
        self.stride = tuple(self.meta["stride"])
        self.window_batch = int(self.meta.get("window_batch") or 0)
        self.depth_max = float(self.meta.get("depth_max", 80.0))
        self.model_name = self.meta.get(
            "model_name", os.path.basename(os.path.normpath(export_dir))
        )

    # -- Inferencer-compatible surface ------------------------------------

    def predict(
        self,
        images: np.ndarray,
        mode: str = "whole",
        crop: Tuple[int, int] = (640, 640),
        stride: Tuple[int, int] = (426, 426),
        window_batch: int = 0,
        fetch: str = "argmax",
    ) -> Dict[str, np.ndarray]:
        """uint8 [B, H, W, 3] -> {'seg', 'depth'?} per the fetch policy.

        Preprocessing (CLIP normalization) is baked into the exported
        program, so raw uint8 frames go straight in.  The request must
        match the export's specialization exactly."""
        import jax.numpy as jnp

        images = np.asarray(images)
        if tuple(images.shape) != self.input_shape:
            raise ValueError(
                f"exported program is specialized to input "
                f"{self.input_shape}, got {tuple(images.shape)}"
            )
        if images.dtype != np.uint8:
            # The live Inferencer accepts uint8 OR float frames; this
            # program bakes uint8-in preprocessing, and a silent cast
            # would truncate 0..1-scaled floats to near-black garbage.
            raise ValueError(
                f"exported program takes uint8 frames, got {images.dtype}; "
                f"scale to 0..255 uint8 before predict"
            )
        if mode != self.mode:
            raise ValueError(
                f"exported program runs mode={self.mode!r}, got {mode!r}"
            )
        if self.mode == "slide" and (
            tuple(crop) != self.crop or tuple(stride) != self.stride
        ):
            raise ValueError(
                f"exported slide protocol is crop={self.crop} "
                f"stride={self.stride}, got crop={tuple(crop)} "
                f"stride={tuple(stride)}"
            )
        out = self._program.call(*self._flat, jnp.asarray(images, jnp.uint8))
        if self.export_fetch == "logits":
            # Full-canvas export: apply the fetch policy on device here
            # (jnp ops on the program's output arrays), exactly like the
            # live Inferencer does.
            canvas = out[0] if isinstance(out, (tuple, list)) else out
            seg_logits = canvas[..., : self.num_classes]
            depth = canvas[..., self.num_classes:] if self.with_depth else None
            return package_outputs(seg_logits, depth, fetch)
        # Baked argmax/packed export: the program already emitted final
        # dtypes; a different fetch policy would need a re-export.
        if fetch != self.export_fetch:
            raise ValueError(
                f"export was baked with fetch={self.export_fetch!r}; "
                f"re-export with --fetch {fetch} to serve that policy"
            )
        out = out if isinstance(out, (tuple, list)) else (out,)
        res = {"seg": np.asarray(out[0])}
        if self.with_depth:
            res["depth"] = np.asarray(out[1])
        return res

    def aug_test(self, *args, **kwargs):
        raise ValueError(
            "aug_test is not part of this export; export one program per "
            "scale or serve from a config + checkpoint for multi-scale"
        )
