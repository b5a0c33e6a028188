#!/usr/bin/env python
"""Reconcile slide batch-4 vs batch-1 under the pad-exact 624 protocol.

r4 VERDICT weak #2: docs/PERFORMANCE.md and the flagship config comment
claim batch-4 slide beats batch-1 (26.1 -> 27.1 img/s with
window_batch 20), but the checked-in suite recorded b4 25.64 < b1 26.78
under the 624 crop.  Those suite rows were SEQUENTIAL single-shot runs in
different sessions — exactly the drift mode the repo measurement rule
forbids comparing.  This experiment measures all variants INTERLEAVED in
ONE session (A/B/C/D rounds, repeat until each variant's two fastest agree
within 2%, report min) so the b1-vs-b4 story is same-session and the
window_batch sweep {10, 20, 40} is decided on evidence.

Timing machinery mirrors bench.py: device fori_loop, carry pins two
corner pixels of every output channel for EVERY batch element (the r3
carry-pinning lesson — a batch-0-only carry would let XLA narrow the b4
variants to one frame), one scalar fetch per run.

Usage:  python tools/exp_b4_reconcile.py [--rounds 6] [--iters-b1 8]
Writes one JSON line per variant; run detached on the TPU host.
"""

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config",
                   default="configs/denseclip_vitb16_cityscapes_multitask.yaml")
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--iters-b1", type=int, default=8,
                   help="frames per timed run for batch 1 (b4 uses 1/4)")
    args = p.parse_args(argv)

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

    cfg = load_config(args.config)
    tcfg = cfg.get("test", {}) or {}
    crop = tuple(tcfg.get("crop", [624, 624]))
    stride = tuple(tcfg.get("stride", [426, 426]))
    attn_impl = str((cfg.get("tpu", {}) or {}).get("attn_impl", "auto"))
    model, texts = build_denseclip(
        cfg.model, CITYSCAPES_CLASSES, dtype=jnp.bfloat16,
        attn_impl=attn_impl,
    )
    texts_j = jnp.asarray(texts)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1,) + crop + (3,), jnp.float32),
        texts_j,
    )
    aug = augment_config_from_data_cfg(cfg.get("data", {}), train=False)
    num_out = len(CITYSCAPES_CLASSES) + 1
    cached_text = jax.jit(
        lambda v, t: model.apply(v, t, method="encode_text_base")
    )(variables, texts_j)

    def window_forward(vars_, windows):
        out = model.apply(
            vars_, windows, texts_j, train=False, resize_outputs=False,
            cached_text=cached_text,
        )
        return jnp.concatenate(
            [out["seg"].astype(jnp.float32),
             out["depth"].astype(jnp.float32)], axis=-1,
        )

    def bench_loop(batch, window_batch, iters):
        pre = normalize_image(
            jnp.asarray(np.random.RandomState(0).randint(
                0, 255, (batch, 1024, 2048, 3), dtype=np.uint8
            )), aug.norm_mean, aug.norm_std,
        )

        @jax.jit
        def loop(vars_, image, n):
            def body(i, acc):
                out = slide_inference(
                    lambda w: window_forward(vars_, w),
                    image + acc * 1e-20, num_out,
                    crop=crop, stride=stride, window_batch=window_batch,
                )
                # Pin EVERY batch element and every channel (two corner
                # pixels each): out[0,...] alone would let XLA prune the
                # batch>1 variants down to frame 0's windows — the exact
                # carry-pinning trap the r3 re-baseline documented.
                return (acc + out[:, 0, 0, :].sum()
                        + out[:, -1, -1, :].sum())

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return loop, pre

    variants = {
        "b1_wb0": (1, 0, args.iters_b1),
        "b4_wb10": (4, 10, max(args.iters_b1 // 4, 2)),
        "b4_wb20": (4, 20, max(args.iters_b1 // 4, 2)),
        "b4_wb0": (4, 0, max(args.iters_b1 // 4, 2)),
    }
    loops = {}
    for name, (b, wb, iters) in variants.items():
        t0 = time.perf_counter()
        loop, pre = bench_loop(b, wb, iters)
        float(loop(variables, pre, 1))  # compile + warm
        print(f"# warmed {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
        loops[name] = (loop, pre, b, iters)

    times = {k: [] for k in variants}

    def settled(ts):
        if len(ts) < 2:
            return False
        a, b = sorted(ts)[:2]
        return (b - a) / a < 0.02

    for rnd in range(args.rounds):
        for name, (loop, pre, b, iters) in loops.items():
            t0 = time.perf_counter()
            float(loop(variables, pre, iters))
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"# round {rnd} {name}: {b * iters / dt:.2f} img/s",
                  flush=True)
        if all(settled(ts) for ts in times.values()):
            break

    for name, (loop, pre, b, iters) in loops.items():
        best = min(times[name])
        drift = (max(times[name]) - best) / best
        print(json.dumps({
            "variant": name, "images_per_sec": round(b * iters / best, 3),
            "crop": list(crop), "rounds": len(times[name]),
            "drift_pct": round(100 * drift, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
