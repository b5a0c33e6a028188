#!/usr/bin/env python
"""Serving daemon: config + checkpoint -> HTTP inference endpoint.

TPU-native serving surface for the reference's inference path (reference:
segmentation/denseclip/denseclip.py:938-1041 — only reachable there via the
broken mmseg test.py).  See denseclip_vit_multimodal_tpu/infer/server.py for
the endpoint contract.

    python tools/serve.py CONFIG CHECKPOINT --port 8000 --mode slide \
        --warmup 1024 2048
    curl -s -X POST --data-binary @frame.png \
        'localhost:8000/v1/predict?format=json'
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Serve DenseCLIP over HTTP")
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax checkpoint dir or work dir")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--mode", choices=["whole", "slide"], default="slide")
    p.add_argument("--crop", type=int, nargs=2, default=None)
    p.add_argument("--stride", type=int, nargs=2, default=None)
    p.add_argument("--window-batch", type=int, default=None)
    p.add_argument("--aug-test", action="store_true",
                   help="multi-scale + flip averaging per request")
    p.add_argument("--fetch", choices=["argmax", "packed"], default="argmax",
                   help="device->host policy: packed = uint8 seg + f16 "
                        "depth (~2.7x smaller fetch + npz)")
    p.add_argument("--warmup", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="compile for this input size before accepting traffic")
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    return p.parse_args(argv)


def build_service(args):
    """config + checkpoint -> (InferenceService, restored epoch).

    Split from main() so tests (and embedding applications) can assemble
    the serving stack without binding a socket.
    """
    import jax
    import jax.numpy as jnp

    from denseclip_vit_multimodal_tpu.core.config import (
        load_config,
        resolve_config_path,
        resolve_test_protocol,
    )
    from denseclip_vit_multimodal_tpu.data.augment import (
        augment_config_from_data_cfg,
    )
    from denseclip_vit_multimodal_tpu.infer.engine import Inferencer
    from denseclip_vit_multimodal_tpu.infer.server import InferenceService
    from denseclip_vit_multimodal_tpu.models.denseclip import build_denseclip
    from denseclip_vit_multimodal_tpu.train.checkpoint import restore_checkpoint
    from denseclip_vit_multimodal_tpu.train.loop import class_names_for
    from denseclip_vit_multimodal_tpu.train.state import create_train_state
    from denseclip_vit_multimodal_tpu.utils.env import apply_tpu_options

    cfg = load_config(resolve_config_path(args.config), overrides=args.overrides)
    crop, stride, window_batch = resolve_test_protocol(
        cfg, args.crop, args.stride, args.window_batch
    )
    class_names = class_names_for(cfg.get("data", {}))
    tpu_cfg = cfg.get("tpu", {}) or {}
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
    service = InferenceService(
        infer, mode=args.mode, crop=tuple(crop), stride=tuple(stride),
        window_batch=window_batch, aug_test=args.aug_test,
        depth_max=float(cfg.get("data", {}).get("depth_max", 80.0)),
        model_name=os.path.basename(str(args.config)),
        fetch=args.fetch,
    )
    return service, epoch


def main(argv=None):
    args = parse_args(argv)
    from denseclip_vit_multimodal_tpu.infer.server import make_server

    service, epoch = build_service(args)
    if args.warmup:
        print(f"warmup compile at {args.warmup[0]}x{args.warmup[1]} ...",
              flush=True)
        service.warmup(tuple(args.warmup))
    server = make_server(service, args.host, args.port)
    print(f"serving {args.config} (epoch {epoch}) on "
          f"http://{args.host}:{server.server_address[1]}  "
          f"mode={service.mode} crop={service.crop} stride={service.stride}",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
