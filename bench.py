#!/usr/bin/env python
"""Benchmark: Cityscapes 1024x2048 slide-window inference images/sec/chip.

The north-star metric (BASELINE.md): full-frame sliding-window joint
seg+depth inference with the flagship DenseCLIP ViT-B/16 model, bf16
compute.  The reference publishes no numbers; `vs_baseline` is measured
against REFERENCE_GPU_IPS, a PyTorch-reference estimate of the same workload
(whole-frame fp32 forward ~0.55 img/s on the reference's unspecified GPU —
recorded here so rounds are comparable; update if the driver supplies a
measured figure).

Protocols (both measured, both in the JSON line):
- `value` — the framework's SHIPPED serving protocol (flagship config
  `test:` section): crop 624x624, stride 426x426.  624 is the pad-exact
  crop (39x39+1 = 1522 tokens -> kernel pad 1536; the reference's 640
  wastes 63 of 1664 padded tokens = 7.8% of attention work) with the SAME
  2x5 full-coverage window grid on 1024x2048.  Measured +12.8% over the
  640 protocol, interleaved same-session (docs/PERFORMANCE.md round 4).
- `value_reference_protocol` — crop 640x640 stride 426x426 (reference
  configs/denseclip_fpn_vit-b_640x640_80k.py:50), directly comparable to
  rounds 1-3 (r3: 25.07).

Timing methodology: the execution environment may reach the TPU through a
remote-dispatch tunnel with ~30 ms RPC latency per call and an unreliable
`block_until_ready`, so the benchmark loop runs ON DEVICE — `lax.fori_loop`
over ITERS slide-inferences with a carry-dependent input perturbation (which
serializes iterations and defeats loop-invariant hoisting) — and fetches one
scalar.  Wall time divided by ITERS is then pure device throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"value_reference_protocol", "crop_shipped", "crop_reference"} plus, when
cost analysis is available, {"model_tflops_per_image", "mfu_pct",
"peak_bf16_tflops"}.
"""

from __future__ import annotations

import json
import math
import time

import numpy as np

REFERENCE_GPU_IPS = 0.55  # see module docstring
CROP_SHIPPED = (624, 624)  # pad-exact serving protocol (see docstring)
CROP_REFERENCE = (640, 640)  # reference protocol, r1-r3 comparable
IMAGE_HW = (1024, 2048)
STRIDE = (426, 426)
BATCH = 1
ITERS = 16


def main():
    import jax
    import jax.numpy as jnp

    from denseclip_vit_multimodal_tpu.core.config import load_config
    from denseclip_vit_multimodal_tpu.data.augment import (
        augment_config_from_data_cfg,
        normalize_image,
    )
    from denseclip_vit_multimodal_tpu.infer.slide import slide_inference
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        CITYSCAPES_CLASSES,
        build_denseclip,
    )

    cfg = load_config("configs/denseclip_vitb16_cityscapes_multitask.yaml")
    # One attn_impl drives BOTH the model's dispatch and the MFU
    # accounting below — building with the default while accounting with
    # the config's value would silently mis-count attention FLOPs.
    attn_impl = str((cfg.get("tpu", {}) or {}).get("attn_impl", "auto"))
    model, texts = build_denseclip(
        cfg.model, CITYSCAPES_CLASSES, dtype=jnp.bfloat16,
        attn_impl=attn_impl,
    )
    h, w = IMAGE_HW
    texts_j = jnp.asarray(texts)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + CROP_REFERENCE + (3,), jnp.float32),
        texts_j,
    )
    aug_cfg = augment_config_from_data_cfg(cfg.get("data", {}), train=False)
    num_out = len(CITYSCAPES_CLASSES) + 1  # seg logits + depth

    def window_forward(vars_, windows, cached_text):
        # Head-resolution logits: slide_inference fuses the upsample into
        # its scatter loop (infer/slide.py).
        out = model.apply(
            vars_, windows, texts_j, train=False, resize_outputs=False,
            cached_text=cached_text,
        )
        return jnp.concatenate(
            [out["seg"].astype(jnp.float32), out["depth"].astype(jnp.float32)],
            axis=-1,
        )

    def one_frame_fn(crop):
        def one_frame(vars_, image, cached_text):
            return slide_inference(
                lambda win: window_forward(vars_, win, cached_text),
                image, num_out, crop=crop, stride=STRIDE,
            )

        return one_frame

    def bench_loop_fn(crop):
        one_frame = one_frame_fn(crop)

        @jax.jit
        def bench_loop(vars_, image, cached_text, iters):
            def body(i, acc):
                # acc-dependent perturbation serializes iterations.  The
                # carry reads one pixel of EVERY channel (two corners): a
                # single-element carry let XLA prune the depth head and
                # narrow the 20-channel overlap-add canvas to one channel,
                # inflating the number ~5% (measured 26.5 vs 25.0-25.3
                # same-session; a full-canvas sum times the same as the
                # two-corner read, so the delta was pruned work, not carry
                # cost).
                out = one_frame(vars_, image + acc * 1e-20, cached_text)
                return acc + out[0, 0, 0, :].sum() + out[0, -1, -1, :].sum()

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return bench_loop

    # The image-independent text tower runs ONCE per checkpoint in serving
    # (Inferencer.cache_text, the default user path) — hoist it here the
    # same way.  Exact: the cached path feeds the identical tensor
    # (tests/test_infer.py::test_cached_text_exactness).  Throughput
    # NEUTRAL on v5e (interleaved A/B; the tower is <0.2 ms/frame) —
    # this mirrors the serving path, it is not a perf claim.
    cached_text = jax.jit(
        lambda v, t: model.apply(v, t, method="encode_text_base")
    )(variables, texts_j)

    images = np.random.RandomState(0).randint(
        0, 255, (BATCH, h, w, 3), dtype=np.uint8
    )
    pre = normalize_image(
        jnp.asarray(images), aug_cfg.norm_mean, aug_cfg.norm_std
    )

    # Both protocols are compiled + warmed first, then timed INTERLEAVED
    # A/B/A/B (the repo measurement rule: a fresh relay session's first
    # timed programs read up to ~15% low, so sequential per-protocol
    # timing biases whichever runs first — which here would deflate the
    # round-comparable reference number and inflate the 624-vs-640 delta).
    # Each ~0.6 s run repeats until each protocol's two fastest agree
    # within 2% (max 6 rounds); report each protocol's min: the
    # steady-state device number, not a drift sample.
    def warmed_loop(crop):
        loop = bench_loop_fn(crop)
        float(loop(variables, pre, cached_text, 1))
        return loop

    loops = {"ref": warmed_loop(CROP_REFERENCE),
             "shipped": warmed_loop(CROP_SHIPPED)}
    times = {"ref": [], "shipped": []}

    def settled(ts):
        if len(ts) < 2:
            return False
        best, second = sorted(ts)[:2]
        return second - best < 0.02 * best

    for _ in range(6):
        for key in ("ref", "shipped"):
            t0 = time.perf_counter()
            float(loops[key](variables, pre, cached_text, ITERS))
            times[key].append(time.perf_counter() - t0)
        if settled(times["ref"]) and settled(times["shipped"]):
            break
    ips_ref = BATCH * ITERS / min(times["ref"])
    ips = BATCH * ITERS / min(times["shipped"])

    # MFU anchor: model FLOPs per frame = XLA cost analysis of the
    # single-frame program + the analytic correction for its two blind
    # spots (the nn.scan'd backbone body is charged once, the Pallas
    # attention custom call zero — utils/flops.py).  Divided by measured
    # frame time and the chip's bf16 peak, this makes "at the floor" an
    # absolute number instead of a round-over-round delta.
    extra = {}
    try:
        from denseclip_vit_multimodal_tpu.infer.slide import slide_grid
        from denseclip_vit_multimodal_tpu.utils.flops import (
            corrected_program_flops,
            device_peak_bf16_tflops,
        )

        crop = CROP_SHIPPED
        frame_fn = jax.jit(one_frame_fn(crop))
        bb = cfg.model.backbone
        tokens = (crop[0] // bb.patch_size) * (crop[1] // bb.patch_size) + 1
        n_win = BATCH * len(slide_grid(IMAGE_HW, crop, STRIDE))
        flops = corrected_program_flops(
            frame_fn.lower(variables, pre, cached_text).compile(),
            bb, n_win, tokens, attn_impl=attn_impl,
        )
        peak = device_peak_bf16_tflops(jax.devices()[0])
        # A backend whose cost_analysis omits 'flops' yields NaN, which
        # no exception guard catches and which breaks strict-JSON
        # consumers of the one-line contract — emit nothing instead.
        if math.isfinite(flops):
            extra = {
                "model_tflops_per_image": round(flops / 1e12, 3),
                "mfu_pct": round(
                    100.0 * flops * ips / BATCH / (peak * 1e12), 2
                ),
                "peak_bf16_tflops": peak,
            }
    except Exception:
        pass  # cost analysis is advisory; never break the bench line

    print(
        json.dumps(
            {
                "metric": "cityscapes_1024x2048_slide_infer_images_per_sec_per_chip",
                "value": round(ips, 4),
                "unit": "images/sec",
                "vs_baseline": round(ips / REFERENCE_GPU_IPS, 3),
                "value_reference_protocol": round(ips_ref, 4),
                "crop_shipped": list(CROP_SHIPPED),
                "crop_reference": list(CROP_REFERENCE),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
