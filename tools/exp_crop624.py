#!/usr/bin/env python
"""Experiment: ViT-B slide crop 624 vs the reference 640 (pad efficiency).

At crop 640 each window is 40x40+1 = 1601 tokens, padded to 1664 for the
128-lane kernel: 63 dead tokens (3.8% of dense work, 7.8% of attention
work).  Crop 624 gives 39x39+1 = 1522 -> pad 1536: 14 dead tokens, and the
window grid on 1024x2048 at stride 426 stays 2x5 = 10 windows with full
coverage (overlap 198 vs 214).  Precedent: the ViT-L/14 preset already
ships a pad-exact test crop (630 = 45*14 -> 2026 -> pad 2048; +8% measured)
in its config `test:` section.

Measures slide throughput interleaved A(640)/B(624)/A/B in one session.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from denseclip_vit_multimodal_tpu.core.config import load_config  # noqa: E402
from denseclip_vit_multimodal_tpu.data.augment import (  # noqa: E402
    augment_config_from_data_cfg,
    normalize_image,
)
from denseclip_vit_multimodal_tpu.infer.slide import (  # noqa: E402
    slide_grid,
    slide_inference,
)
from denseclip_vit_multimodal_tpu.models.denseclip import (  # noqa: E402
    CITYSCAPES_CLASSES,
    build_denseclip,
)

IMAGE_HW = (1024, 2048)
STRIDE = (426, 426)
ITERS = 16


def main():
    cfg = load_config("configs/denseclip_vitb16_cityscapes_multitask.yaml")
    model, texts = build_denseclip(
        cfg.model, CITYSCAPES_CLASSES, dtype=jnp.bfloat16
    )
    texts_j = jnp.asarray(texts)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 640, 640, 3), jnp.float32),
        texts_j,
    )
    cached_text = jax.jit(
        lambda v, t: model.apply(v, t, method="encode_text_base")
    )(variables, texts_j)
    aug_cfg = augment_config_from_data_cfg(cfg.get("data", {}), train=False)
    num_out = len(CITYSCAPES_CLASSES) + 1
    images = np.random.RandomState(0).randint(
        0, 255, (1,) + IMAGE_HW + (3,), dtype=np.uint8
    )
    pre = normalize_image(
        jnp.asarray(images), aug_cfg.norm_mean, aug_cfg.norm_std
    )

    def loop_for(crop):
        def window_forward(vars_, windows, ct):
            out = model.apply(
                vars_, windows, texts_j, train=False, resize_outputs=False,
                cached_text=ct,
            )
            return jnp.concatenate(
                [out["seg"].astype(jnp.float32),
                 out["depth"].astype(jnp.float32)], axis=-1,
            )

        def one_frame(vars_, image, ct):
            return slide_inference(
                lambda win: window_forward(vars_, win, ct),
                image, num_out, crop=crop, stride=STRIDE,
            )

        @jax.jit
        def bench_loop(vars_, image, ct):
            def body(i, acc):
                out = one_frame(vars_, image + acc * 1e-20, ct)
                return acc + out[0, 0, 0, :].sum() + out[0, -1, -1, :].sum()

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        return bench_loop

    loops = {c: loop_for((c, c)) for c in (640, 624)}
    for c, lp in loops.items():
        print(c, "windows:", len(slide_grid(IMAGE_HW, (c, c), STRIDE)),
              flush=True)
        float(lp(variables, pre, cached_text))  # compile + warm

    for tag in ("A640", "B624", "A640", "B624"):
        c = 640 if "640" in tag else 624
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(loops[c](variables, pre, cached_text))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {ITERS / best:.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
