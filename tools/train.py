#!/usr/bin/env python
"""Training CLI.

Mirrors the reference CLI schema (reference:
segmentation/train_denseclip.py:75-96): positional config plus --work-dir,
--resume, --load, --seed, --deterministic, --no-validate.  GPU-count /
launcher flags disappear — device topology comes from the JAX runtime and
the `tpu.mesh` config; dotted --set overrides replace ad-hoc edits.

    python tools/train.py configs/denseclip_vitb16_cityscapes_multitask.yaml \
        --work-dir work_dirs/multitask --set training.epochs=10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train DenseCLIP (TPU-native)")
    p.add_argument("config", help="config YAML path or preset name")
    p.add_argument("--work-dir", default=None, help="output directory")
    p.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    p.add_argument("--load", default=None, help="checkpoint dir to warm-start weights")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--deterministic", action="store_true",
                   help="fixed PRNG + highest matmul precision")
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap total optimizer steps (smoke runs)")
    p.add_argument("--set", dest="overrides", nargs="*", default=[],
                   metavar="KEY.PATH=VALUE", help="dotted config overrides")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from denseclip_vit_multimodal_tpu.core.config import (
        load_config,
        resolve_config_path,
    )

    cfg = load_config(resolve_config_path(args.config), overrides=args.overrides)
    if args.seed is not None:
        cfg.setdefault("training", {})["seed"] = args.seed
    if args.deterministic:
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")

    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(str(args.config)))[0]
    )
    os.makedirs(work_dir, exist_ok=True)

    from denseclip_vit_multimodal_tpu.train.loop import train

    metrics = train(
        cfg,
        work_dir,
        resume=args.resume,
        load=args.load,
        max_steps=args.max_steps,
        no_validate=args.no_validate,
    )
    print({k: round(v, 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
