#!/usr/bin/env python
"""Profiling CLI: per-step timing, XLA cost analysis, optional trace capture.

The reference has no profiling story at all (SURVEY.md §5.1 — its FLOPs tool
is broken).  This tool times the forward / train step on device, reports the
compiler's cost analysis, and can capture a jax.profiler trace viewable in
TensorBoard/Perfetto.

    python tools/profile_model.py CONFIG --mode forward --shape 640 640 --batch 10
    python tools/profile_model.py CONFIG --mode train --trace-dir /tmp/trace
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description="Profile DenseCLIP on this backend")
    p.add_argument("config")
    p.add_argument("--mode", choices=["forward", "train", "slide"],
                   default="forward")
    p.add_argument("--shape", type=int, nargs=2, default=[640, 640])
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler trace here")
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from denseclip_vit_multimodal_tpu.core.config import (
        load_config,
        resolve_config_path,
    )
    from denseclip_vit_multimodal_tpu.data.augment import (
        AugmentConfig,
        augment_config_from_data_cfg,
    )
    from denseclip_vit_multimodal_tpu.models.denseclip import build_denseclip
    from denseclip_vit_multimodal_tpu.train.loop import class_names_for
    from denseclip_vit_multimodal_tpu.utils.env import collect_env_info, profiler_trace

    print(collect_env_info())
    cfg = load_config(resolve_config_path(args.config), overrides=args.overrides)
    tpu_cfg = cfg.get("tpu", {}) or {}
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        str(tpu_cfg.get("compute_dtype", "bfloat16"))
    ]
    model, texts = build_denseclip(
        cfg.model, class_names_for(cfg.get("data", {})), dtype=dtype,
        attn_impl=str(tpu_cfg.get("attn_impl", "auto")),
    )
    texts_j = jnp.asarray(texts)
    h, w = args.shape
    b = args.batch
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32), texts_j
    )

    if args.mode == "forward":
        fn = jax.jit(lambda v, im: model.apply(v, im, texts_j, train=False)["seg"])
        arg = jnp.zeros((b, h, w, 3), jnp.float32)
        run_args = (variables, arg)
    elif args.mode == "slide":
        from denseclip_vit_multimodal_tpu.infer.slide import slide_inference

        def one(v, im):
            def wf(win):
                out = model.apply(v, win, texts_j, train=False)
                parts = [out["seg"].astype(jnp.float32)]
                if out.get("depth") is not None:
                    parts.append(out["depth"].astype(jnp.float32))
                return jnp.concatenate(parts, -1)

            n_out = model.num_classes + (1 if cfg.model.get("depth_head") else 0)
            return slide_inference(wf, im, n_out, crop=(h, w))

        fn = jax.jit(one)
        arg = jnp.zeros((1, 1024, 2048, 3), jnp.float32)
        run_args = (variables, arg)
    else:  # train
        from denseclip_vit_multimodal_tpu.train.state import create_train_state
        from denseclip_vit_multimodal_tpu.train.step import make_train_step

        state = create_train_state(model, variables, cfg.get("training", {}), 100)
        aug_cfg = augment_config_from_data_cfg(cfg.get("data", {}), train=True)
        step = make_train_step(texts, aug_cfg)
        rngb = np.random.RandomState(0)
        ch, cw = aug_cfg.crop_size
        batch = {
            "image": rngb.randint(0, 255, (b, ch * 2, cw * 2, 3)).astype(np.uint8),
            "seg": rngb.randint(0, model.num_classes, (b, ch * 2, cw * 2)).astype(np.uint8),
            "depth": rngb.uniform(0.1, 80, (b, ch * 2, cw * 2)).astype(np.float32),
        }

        def fn(state, batch):
            new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
            return new_state, metrics["loss_total"]

        run_args = (state, batch)

    # cost analysis (forward/slide only — train donates)
    if args.mode != "train":
        compiled = fn.lower(*run_args).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})
        print(f"flops        : {ca.get('flops', float('nan')) / 1e12:.3f} TFLOP")
        print(f"bytes access : {ca.get('bytes accessed', float('nan')) / 1e9:.3f} GB")

    # timing (on-device loop not used here: profile runs are short and the
    # per-call overhead is visible in the trace anyway).  Completion is
    # forced by fetching one scalar — through the relay
    # jax.block_until_ready returns immediately (CLAUDE.md), so a
    # block-based stopwatch would time only the dispatch RPCs.
    def force(o):
        leaf = jax.tree.leaves(o)[0]
        return float(jnp.asarray(leaf).ravel()[0])

    out = fn(*run_args)
    if args.mode == "train":
        # the train step donates its input state; chain the warmup output
        # or the first timed call would read deleted buffers
        run_args = (out[0], run_args[1])
    force(out)
    with profiler_trace(args.trace_dir):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*run_args)
            if args.mode == "train":
                run_args = (out[0], run_args[1])
        force(out)
        dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.mode}: {dt * 1e3:.2f} ms/iter "
          f"({args.batch / dt:.2f} samples/sec)")
    if args.trace_dir:
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
