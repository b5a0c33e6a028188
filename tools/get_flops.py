#!/usr/bin/env python
"""FLOPs / parameter report via XLA cost analysis.

Replaces the reference's broken fvcore tool (reference:
segmentation/get_flops.py — imports a nonexistent `denseclip.build_model`,
get_flops.py:8) with `jit(...).lower(...).compile().cost_analysis()`,
which reports what the compiler will actually execute.

    python tools/get_flops.py CONFIG --shape 512 1024
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description="DenseCLIP FLOPs report")
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=[512, 1024])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from denseclip_vit_multimodal_tpu.core.config import (
        load_config,
        resolve_config_path,
    )
    from denseclip_vit_multimodal_tpu.models.denseclip import build_denseclip
    from denseclip_vit_multimodal_tpu.train.loop import class_names_for
    from denseclip_vit_multimodal_tpu.train.state import count_params

    cfg = load_config(resolve_config_path(args.config), overrides=args.overrides)
    model, texts = build_denseclip(cfg.model, class_names_for(cfg.get("data", {})))
    h, w = args.shape
    image = jnp.zeros((args.batch, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), image, jnp.asarray(texts))

    n_params = count_params(variables["params"])
    fwd = jax.jit(lambda v, im, tx: model.apply(v, im, tx, train=False))
    compiled = fwd.lower(variables, image, jnp.asarray(texts)).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))

    # Cost analysis charges the nn.scan'd ViT backbone body ONCE and the
    # Pallas attention custom call ZERO — corrected_program_flops adds the
    # analytic make-up term (see utils/flops.py for the derivation), keyed
    # on the ACTUAL attention dispatch for this impl + token count.
    from denseclip_vit_multimodal_tpu.utils.flops import (
        corrected_program_flops,
    )

    bb = cfg.model.backbone
    tokens = (
        (h // bb.patch_size) * (w // bb.patch_size) + 1
        if str(bb.get("type", "")).endswith("VisionTransformer") else 0
    )
    total = corrected_program_flops(
        compiled, bb, args.batch, tokens,
        attn_impl=str((cfg.get("tpu", {}) or {}).get("attn_impl", "auto")),
    )
    correction = total - flops

    print(f"input shape : {args.batch}x{h}x{w}x3")
    print(f"parameters  : {n_params / 1e6:.2f} M")
    print(f"forward flops: {(flops + correction) / 1e9:.2f} GFLOPs")
    if correction:
        print(
            f"  (= {flops / 1e9:.2f} XLA-counted + {correction / 1e9:.2f} "
            "scanned-backbone/Pallas correction)"
        )
    print(f"hbm bytes    : {bytes_ / 1e9:.3f} GB")


if __name__ == "__main__":
    main()
