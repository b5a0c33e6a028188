#!/usr/bin/env python
"""Single-image / directory inference demo: image(s) -> seg + depth PNGs.

Serving-surface counterpart of the reference's `simple_test`/`aug_test`
(reference: segmentation/denseclip/denseclip.py:982-1041) as a CLI.

    python tools/infer.py CONFIG CHECKPOINT image.png -o out/
    python tools/infer.py CONFIG CHECKPOINT frames/ --mode slide --aug-test
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description="Run DenseCLIP inference on images")
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax checkpoint dir or work dir")
    p.add_argument("inputs", help="image file or directory")
    p.add_argument("-o", "--out-dir", default="inference_out")
    p.add_argument("--mode", choices=["whole", "slide"], default="whole")
    # slide protocol defaults come from the config `test:` section
    p.add_argument("--crop", type=int, nargs=2, default=None)
    p.add_argument("--stride", type=int, nargs=2, default=None)
    p.add_argument("--window-batch", type=int, default=None,
                   help="chunk the slide window batch through lax.map")
    p.add_argument("--aug-test", action="store_true")
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from denseclip_vit_multimodal_tpu.core.config import (
        load_config,
        resolve_config_path,
        resolve_test_protocol,
    )
    from denseclip_vit_multimodal_tpu.data.augment import (
        augment_config_from_data_cfg,
    )
    from denseclip_vit_multimodal_tpu.infer.engine import Inferencer
    from denseclip_vit_multimodal_tpu.models.denseclip import build_denseclip
    from denseclip_vit_multimodal_tpu.train.checkpoint import restore_checkpoint
    from denseclip_vit_multimodal_tpu.train.loop import class_names_for
    from denseclip_vit_multimodal_tpu.train.state import create_train_state
    from denseclip_vit_multimodal_tpu.utils.visualize import (
        colorize_depth,
        colorize_seg,
    )

    cfg = load_config(resolve_config_path(args.config), overrides=args.overrides)
    args.crop, args.stride, args.window_batch = resolve_test_protocol(
        cfg, args.crop, args.stride, args.window_batch
    )
    class_names = class_names_for(cfg.get("data", {}))
    tpu_cfg = cfg.get("tpu", {}) or {}
    from denseclip_vit_multimodal_tpu.utils.env import apply_tpu_options

    apply_tpu_options(tpu_cfg)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        str(tpu_cfg.get("compute_dtype", "bfloat16"))
    ]
    model, texts = build_denseclip(
        cfg.model, class_names, dtype=dtype,
        attn_impl=str(tpu_cfg.get("attn_impl", "auto")),
    )
    aug_cfg = augment_config_from_data_cfg(cfg.get("data", {}), train=False)
    ch, cw = aug_cfg.crop_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, ch, cw, 3)), jnp.asarray(texts)
    )
    state = create_train_state(model, variables, cfg.get("training", {}), 1)
    state, epoch, _ = restore_checkpoint(args.checkpoint, state)
    infer = Inferencer(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        texts, aug_cfg,
        num_classes=len(class_names),
        with_depth=bool(cfg.model.get("depth_head")),
    )

    if os.path.isdir(args.inputs):
        paths = sorted(
            sum((glob.glob(os.path.join(args.inputs, e))
                 for e in ("*.png", "*.jpg", "*.jpeg")), [])
        )
    else:
        paths = [args.inputs]
    if not paths:
        raise SystemExit(f"no images found under {args.inputs}")
    os.makedirs(args.out_dir, exist_ok=True)

    for path in paths:
        img = np.asarray(Image.open(path).convert("RGB"), np.uint8)[None]
        # fetch="argmax": this CLI only renders seg argmax + depth, so
        # don't drag the full fp32 logit canvas (~160 MB at 1024x2048)
        # across the host boundary per frame.
        kwargs = dict(mode=args.mode, crop=tuple(args.crop),
                      stride=tuple(args.stride),
                      window_batch=args.window_batch, fetch="argmax")
        out = (infer.aug_test(img, **kwargs) if args.aug_test
               else infer.predict(img, **kwargs))
        base = os.path.splitext(os.path.basename(path))[0]
        Image.fromarray(colorize_seg(out["seg"][0])).save(
            os.path.join(args.out_dir, f"{base}_seg.png")
        )
        if "depth" in out:
            Image.fromarray(
                colorize_depth(out["depth"][0],
                               float(cfg.get("data", {}).get("depth_max", 80.0)))
            ).save(os.path.join(args.out_dir, f"{base}_depth.png"))
        print(f"{path} -> {args.out_dir}/{base}_seg.png")


if __name__ == "__main__":
    main()
