#!/usr/bin/env python
"""Stage-budget the train step: aug / forward / backward / optimizer.

Times each stage of the jitted train step separately so optimization work
targets the real wall-clock sink (the reference has no train profiling at
all — its trainer logs wall time per epoch only,
segmentation/train_denseclip.py:1296-1310).

    python tools/profile_train_stages.py configs/denseclip_fpn_vitb16_640x640_80k_cityscapes.yaml \
        --batch 8 --heritage --iters 8

Stages reported (each its own jitted program, timed over --iters):
  aug        on-device augmentation of the raw uint8 batch
  fwd        forward + losses on pre-augmented crops (no grad)
  grad       value_and_grad over the trainable leaves
  full       the shipped make_train_step (aug + grad + optimizer + metrics)
`opt+misc` is reported as full − aug − grad (attribution by subtraction:
the optimizer update, NaN gating, metric assembly).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--heritage", action="store_true",
                   help="live ViT backward (text tower frozen only)")
    p.add_argument("--src", type=int, nargs=2, default=[1024, 2048],
                   help="raw input size fed to on-device augmentation")
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
        augment_batch,
        augment_config_from_data_cfg,
    )
    from denseclip_vit_multimodal_tpu.models.denseclip import build_denseclip
    from denseclip_vit_multimodal_tpu.train.loop import class_names_for
    from denseclip_vit_multimodal_tpu.train.losses import (
        cross_entropy_loss,
        silog_loss,
    )
    from denseclip_vit_multimodal_tpu.train.state import create_train_state
    from denseclip_vit_multimodal_tpu.train.step import make_train_step

    cfg = load_config(resolve_config_path(args.config),
                      overrides=args.overrides)
    tpu_cfg = cfg.get("tpu", {}) or {}
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        str(tpu_cfg.get("compute_dtype", "bfloat16"))
    ]
    class_names = class_names_for(cfg.get("data", {}))
    model, texts = build_denseclip(
        cfg.model, class_names, dtype=dtype,
        attn_impl=str(tpu_cfg.get("attn_impl", "auto")),
        remat=tpu_cfg.get("remat", False),
    )
    texts_j = jnp.asarray(texts)
    aug_cfg = augment_config_from_data_cfg(cfg.get("data", {}), train=True)
    crop = tuple(aug_cfg.crop_size)

    frozen = ("text_encoder",) if args.heritage else (
        "backbone", "text_encoder")
    tcfg = dict(cfg.get("training", {}))
    if args.heritage:
        tcfg["lr_mults"] = {"backbone": 0.1}

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, crop[0], crop[1], 3), jnp.float32),
        texts_j,
    )
    state = create_train_state(model, variables, tcfg, 100)

    b = args.batch
    rng = np.random.RandomState(0)
    sh, sw = args.src
    batch = {
        "image": jnp.asarray(
            rng.randint(0, 255, (b, sh, sw, 3)).astype(np.uint8)),
        "seg": jnp.asarray(
            rng.randint(0, len(class_names), (b, sh, sw)).astype(np.uint8)),
        "depth": jnp.asarray(
            rng.uniform(0.1, 80, (b, sh, sw)).astype(np.float32)),
    }
    key = jax.random.PRNGKey(0)

    def timeit(fn, *a):
        out = fn(*a)
        jax.tree.map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, out)
        # sync via a scalar fetch (relay block_until_ready is unreliable)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")]
        float(leaves[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")]
        float(leaves[0].reshape(-1)[0])
        return (time.perf_counter() - t0) / args.iters

    report = {}

    # --- stage: augmentation -------------------------------------------------
    aug_fn = jax.jit(lambda k, bt: augment_batch(k, bt, aug_cfg))
    report["aug"] = timeit(aug_fn, key, batch)
    aug = jax.device_put(jax.jit(lambda k, bt: augment_batch(k, bt, aug_cfg))(
        key, batch))

    # --- stage: forward + losses (no grad) -----------------------------------
    trainable = {k: v for k, v in state.params.items() if k not in frozen}
    frozen_params = {k: v for k, v in state.params.items() if k in frozen}
    bstats = state.batch_stats

    # Frozen/static trees ride as ARGUMENTS, not closures: the remote
    # compile service rejects HLO payloads with the towers baked in as
    # constants (HTTP 413; CLAUDE.md environment notes).
    def loss_fn(trainable_part, frozen_part, stats, aug_b, drop_rng):
        params = {**trainable_part, **frozen_part}
        out, _ = state.apply_fn(
            {"params": params, "batch_stats": stats},
            aug_b["image"], texts_j, train=True, gt_hw=crop,
            mutable=["batch_stats"], rngs={"dropout": drop_rng},
        )
        total = cross_entropy_loss(out["seg"], aug_b["seg"],
                                   ignore_index=aug_cfg.ignore_index)
        if out.get("depth") is not None:
            total = total + 0.1 * silog_loss(
                out["depth"], aug_b["depth"], aug_b.get("depth_mask"))
        return total

    fwd_fn = jax.jit(loss_fn)
    report["fwd"] = timeit(fwd_fn, trainable, frozen_params, bstats, aug, key)

    # --- stage: forward + backward -------------------------------------------
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    report["grad"] = timeit(
        grad_fn, trainable, frozen_params, bstats, aug, key)

    # --- stage: the shipped full step ----------------------------------------
    step = make_train_step(texts_j, aug_cfg, frozen_modules=frozen,
                           grad_accum_steps=int(
                               tcfg.get("grad_accum_steps", 1)))
    st = state
    st, m = step(st, batch, key)
    float(m["loss_total"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        st, m = step(st, batch, key)
    float(m["loss_total"])
    report["full"] = (time.perf_counter() - t0) / args.iters

    report["bwd_only"] = report["grad"] - report["fwd"]
    report["opt+misc"] = report["full"] - report["aug"] - report["grad"]
    print(f"\n== train stage budget (batch {b}, crop {crop}, "
          f"{'heritage' if args.heritage else 'frozen towers'}) ==")
    for k in ("aug", "fwd", "bwd_only", "grad", "opt+misc", "full"):
        print(f"  {k:10s} {report[k]*1e3:8.2f} ms")
    print(f"  throughput {b/report['full']:.2f} samples/s")
    return report


if __name__ == "__main__":
    main()
