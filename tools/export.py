#!/usr/bin/env python
"""Serving export: AOT-serialize the inference function (StableHLO).

Production-deployment surface with no reference equivalent (the reference
serves by importing its training code).  `jax.export` serializes the jitted
whole-image or slide inference program + weights to a directory that a
serving process can load WITHOUT the model-building code:

    python tools/export.py CONFIG CHECKPOINT out_dir --shape 1024 2048 --mode slide
    # later / elsewhere:
    python tools/export.py --load out_dir --selftest

The export is shape-specialized (one program per input size, like any XLA
deployment); weights ship alongside as an .npz keyed by flattened tree path.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def flatten_tree(tree, prefix=""):
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(
            p.key if hasattr(p, "key") else str(getattr(p, "idx", p))
            for p in path
        )
        flat[key] = leaf
    return flat


def main(argv=None):
    p = argparse.ArgumentParser(description="Export DenseCLIP for serving")
    p.add_argument("config", nargs="?")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("out_dir", nargs="?")
    p.add_argument("--shape", type=int, nargs=2, default=[1024, 2048])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--mode", choices=["whole", "slide"], default="whole")
    # slide protocol defaults come from the config `test:` section, like
    # the other CLIs (tools/test.py, tools/infer.py) — the exported program
    # must match what tools/test.py validated (e.g. the ViT-L crop-630
    # protocol), not a hardcoded 640/426.
    p.add_argument("--crop", type=int, nargs=2, default=None)
    p.add_argument("--stride", type=int, nargs=2, default=None)
    p.add_argument("--window-batch", type=int, default=None,
                   help="chunk the slide window batch through lax.map")
    p.add_argument("--fetch", choices=["logits", "argmax", "packed"],
                   default="logits",
                   help="bake the fetch policy into the exported program: "
                        "argmax = int32 seg (+ f32 depth), packed = uint8 "
                        "seg (+ f16 depth) — the device->host compression "
                        "then needs no host-side model code (serving via "
                        "tools/serve.py --from-export)")
    p.add_argument("--load", default=None, help="load + self-test an export dir")
    p.add_argument("--selftest", action="store_true")
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if args.load:
        with open(os.path.join(args.load, "meta.json")) as f:
            meta = json.load(f)
        with open(os.path.join(args.load, "program.bin"), "rb") as f:
            program = jexport.deserialize(f.read())
        weights = np.load(os.path.join(args.load, "weights.npz"))
        flat = [jnp.asarray(weights[k]) for k in meta["weight_keys"]]
        if args.selftest:
            x = jnp.zeros(meta["input_shape"], jnp.uint8)
            out = program.call(*flat, x)
            out = out[0] if isinstance(out, (tuple, list)) else out
            kind = ("seg argmax" if meta.get("fetch", "logits") != "logits"
                    else "seg logits")
            print(f"self-test OK: {kind} {np.asarray(out).shape} "
                  f"fetch={meta.get('fetch', 'logits')}")
        return

    if not (args.config and args.checkpoint and args.out_dir):
        p.error("config, checkpoint and out_dir are required unless --load")

    from denseclip_vit_multimodal_tpu.core.config import (
        load_config,
        resolve_config_path,
        resolve_test_protocol,
    )
    from denseclip_vit_multimodal_tpu.data.augment import (
        augment_config_from_data_cfg,
    )
    from denseclip_vit_multimodal_tpu.infer.slide import slide_inference
    from denseclip_vit_multimodal_tpu.models.denseclip import build_denseclip
    from denseclip_vit_multimodal_tpu.train.checkpoint import restore_checkpoint
    from denseclip_vit_multimodal_tpu.train.loop import class_names_for
    from denseclip_vit_multimodal_tpu.train.state import create_train_state

    cfg = load_config(resolve_config_path(args.config), overrides=args.overrides)
    args.crop, args.stride, args.window_batch = resolve_test_protocol(
        cfg, args.crop, args.stride, args.window_batch
    )
    class_names = class_names_for(cfg.get("data", {}))
    if args.fetch == "packed" and len(class_names) > 256:
        p.error(f"--fetch packed needs <= 256 classes, got {len(class_names)}")
    tpu_cfg = cfg.get("tpu", {}) or {}
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        str(tpu_cfg.get("compute_dtype", "bfloat16"))
    ]
    model, texts = build_denseclip(
        cfg.model, class_names, dtype=dtype,
        attn_impl=str(tpu_cfg.get("attn_impl", "auto")),
    )
    aug = augment_config_from_data_cfg(cfg.get("data", {}), train=False)
    ch, cw = aug.crop_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, ch, cw, 3)), jnp.asarray(texts)
    )
    state = create_train_state(model, variables, cfg.get("training", {}), 1)
    state, _, _ = restore_checkpoint(args.checkpoint, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    texts_j = jnp.asarray(texts)
    mean = jnp.asarray(aug.norm_mean)
    std = jnp.asarray(aug.norm_std)
    n_out = len(class_names) + (1 if cfg.model.get("depth_head") else 0)

    num_classes = len(class_names)
    has_depth = bool(cfg.model.get("depth_head"))

    def infer_fn(*flat_and_image):
        *flat, image = flat_and_image
        tree = jax.tree_util.tree_unflatten(treedef, flat)
        pre = (image.astype(jnp.float32) / 255.0 - mean) / std

        def fwd(im, resize_outputs=True):
            out = model.apply(
                tree, im, texts_j, train=False, resize_outputs=resize_outputs
            )
            parts = [out["seg"].astype(jnp.float32)]
            if out.get("depth") is not None:
                parts.append(out["depth"].astype(jnp.float32))
            return jnp.concatenate(parts, axis=-1)

        if args.mode == "slide":
            # head-resolution logits; slide fuses the upsample (infer/slide.py)
            fwd = functools.partial(fwd, resize_outputs=False)
            canvas = slide_inference(
                fwd, pre, n_out, crop=tuple(args.crop),
                stride=tuple(args.stride), window_batch=args.window_batch,
            )
        else:
            canvas = fwd(pre)
        if args.fetch == "logits":
            return canvas
        # Baked fetch policy: the argmax/compression happens INSIDE the
        # exported program so the serving host never sees the fp32 canvas
        # (same contract as infer/engine.py::package_outputs).
        seg = jnp.argmax(canvas[..., :num_classes], axis=-1)
        seg = seg.astype(jnp.int32 if args.fetch == "argmax" else jnp.uint8)
        if not has_depth:
            return (seg,)
        depth = canvas[..., num_classes]
        depth = depth.astype(
            jnp.float32 if args.fetch == "argmax" else jnp.float16
        )
        return (seg, depth)

    flat, treedef = jax.tree_util.tree_flatten(variables)
    h, w = args.shape
    image_spec = jax.ShapeDtypeStruct((args.batch, h, w, 3), jnp.uint8)
    exported = jexport.export(jax.jit(infer_fn))(
        *[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in flat], image_spec
    )

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "program.bin"), "wb") as f:
        f.write(exported.serialize())
    flat_named = flatten_tree(variables)
    np.savez(
        os.path.join(args.out_dir, "weights.npz"),
        **{k: np.asarray(v) for k, v in flat_named.items()},
    )
    meta = {
        "input_shape": [args.batch, h, w, 3],
        "mode": args.mode,
        "crop": list(args.crop),
        "stride": list(args.stride),
        "window_batch": int(args.window_batch),
        "num_outputs": n_out,
        "class_names": list(class_names),
        "weight_keys": list(flat_named.keys()),
        "fetch": args.fetch,
        "with_depth": has_depth,
        "depth_max": float(cfg.get("data", {}).get("depth_max", 80.0)),
        "model_name": os.path.basename(str(args.config)),
    }
    with open(os.path.join(args.out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported {args.mode} program for {args.batch}x{h}x{w} -> {args.out_dir}")


if __name__ == "__main__":
    main()
