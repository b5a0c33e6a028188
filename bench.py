#!/usr/bin/env python
"""Benchmark: Cityscapes 1024x2048 slide-window inference images/sec/chip.

The north-star metric (BASELINE.md): full-frame sliding-window (crop 640x640,
stride 426x426 — reference configs/denseclip_fpn_vit-b_640x640_80k.py:50)
joint seg+depth inference with the flagship DenseCLIP ViT-B/16 model, bf16
compute.  The reference publishes no numbers; `vs_baseline` is measured
against REFERENCE_GPU_IPS, a PyTorch-reference estimate of the same workload
(whole-frame fp32 forward ~0.55 img/s on the reference's unspecified GPU —
recorded here so rounds are comparable; update if the driver supplies a
measured figure).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_GPU_IPS = 0.55  # see module docstring
IMAGE_HW = (1024, 2048)
CROP = (640, 640)
STRIDE = (426, 426)
BATCH = 1
WARMUP = 2
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    from denseclip_vit_multimodal_tpu.core.config import load_config
    from denseclip_vit_multimodal_tpu.data.augment import (
        augment_config_from_data_cfg,
    )
    from denseclip_vit_multimodal_tpu.infer.engine import Inferencer
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        CITYSCAPES_CLASSES,
        build_denseclip,
    )

    cfg = load_config("configs/denseclip_vitb16_cityscapes_multitask.yaml")
    model, texts = build_denseclip(
        cfg.model, CITYSCAPES_CLASSES, dtype=jnp.bfloat16
    )
    h, w = IMAGE_HW
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng,
        jnp.zeros((1,) + CROP + (3,), jnp.float32),
        jnp.asarray(texts),
    )
    aug_cfg = augment_config_from_data_cfg(cfg.get("data", {}), train=False)
    infer = Inferencer(
        model, variables, texts, aug_cfg,
        num_classes=len(CITYSCAPES_CLASSES), with_depth=True,
    )

    images = np.random.RandomState(0).randint(
        0, 255, (BATCH, h, w, 3), dtype=np.uint8
    )
    pre = infer.preprocess(images)
    run = infer._slide_fn(CROP, STRIDE, 0)

    # Warmup / compile
    for _ in range(WARMUP):
        out = run(infer.variables, pre, infer.texts)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = run(infer.variables, pre, infer.texts)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "cityscapes_1024x2048_slide_infer_images_per_sec_per_chip",
                "value": round(ips, 4),
                "unit": "images/sec",
                "vs_baseline": round(ips / REFERENCE_GPU_IPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
