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
    p.add_argument("config", nargs="?",
                   help="config path (omit with --from-export)")
    p.add_argument("checkpoint", nargs="?",
                   help="orbax checkpoint dir or work dir "
                        "(omit with --from-export)")
    p.add_argument("--from-export", default=None, metavar="DIR",
                   help="serve a tools/export.py bundle (StableHLO program "
                        "+ weights) — no config/checkpoint/model code; "
                        "protocol comes from the bundle's meta.json")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--mode", choices=["whole", "slide"], default=None,
                   help="inference mode (default: slide; with "
                        "--from-export the bundle's mode is authoritative)")
    p.add_argument("--crop", type=int, nargs=2, default=None)
    p.add_argument("--stride", type=int, nargs=2, default=None)
    p.add_argument("--window-batch", type=int, default=None)
    p.add_argument("--aug-test", action="store_true",
                   help="multi-scale + flip averaging per request")
    p.add_argument("--fetch", choices=["argmax", "packed"], default="argmax",
                   help="device->host policy: packed = uint8 seg + f16 "
                        "depth (~2.7x smaller fetch + npz)")
    p.add_argument("--device-timeout", type=float, default=0.0,
                   help="deadline (s) per device call: a miss returns 503 "
                        "and flips /healthz to degraded instead of hanging "
                        "clients on a wedged device (0 = off)")
    p.add_argument("--max-body-mb", type=float, default=64.0,
                   help="reject POST bodies larger than this with 413")
    p.add_argument("--warmup", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="compile for this input size before accepting traffic")
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    args = p.parse_args(argv)
    if args.from_export is None and not (args.config and args.checkpoint):
        p.error("config and checkpoint are required unless --from-export")
    return args


def build_service_from_export(args):
    """export dir -> (InferenceService, epoch=None).

    The bundle's meta.json fixes mode/crop/stride/window_batch; CLI
    protocol flags are rejected when they conflict rather than silently
    ignored.  aug_test is not exportable (one program per scale)."""
    from denseclip_vit_multimodal_tpu.infer.exported import ExportedInferencer
    from denseclip_vit_multimodal_tpu.infer.server import InferenceService

    infer = ExportedInferencer(args.from_export)
    for flag, ours in (("crop", infer.crop), ("stride", infer.stride)):
        want = getattr(args, flag)
        if want is not None and tuple(want) != ours:
            raise SystemExit(
                f"--{flag} {tuple(want)} conflicts with the export's "
                f"{flag}={ours}; re-export to change the protocol"
            )
    if args.mode is not None and args.mode != infer.mode:
        raise SystemExit(
            f"--mode {args.mode} conflicts with the export's "
            f"mode={infer.mode!r}; re-export to change the protocol"
        )
    if (args.window_batch is not None
            and int(args.window_batch) != infer.window_batch):
        raise SystemExit(
            f"--window-batch {args.window_batch} conflicts with the "
            f"export's window_batch={infer.window_batch}; re-export to "
            f"change the protocol"
        )
    if args.aug_test:
        raise SystemExit("--aug-test cannot be served from an export")
    # A 'logits' export still serves any fetch policy (packaging happens
    # on the program's output arrays); a baked export serves exactly its
    # own policy.
    fetch = args.fetch
    if infer.export_fetch in ("argmax", "packed") and fetch != infer.export_fetch:
        raise SystemExit(
            f"export was baked with fetch={infer.export_fetch!r}; "
            f"serve with --fetch {infer.export_fetch} or re-export"
        )
    service = InferenceService(
        infer, mode=infer.mode, crop=infer.crop, stride=infer.stride,
        window_batch=infer.window_batch, depth_max=infer.depth_max,
        model_name=infer.model_name, fetch=fetch,
        device_timeout=args.device_timeout,
    )
    return service, None


def build_service(args):
    """config + checkpoint -> (InferenceService, restored epoch).

    Split from main() so tests (and embedding applications) can assemble
    the serving stack without binding a socket.
    """
    if getattr(args, "from_export", None):
        return build_service_from_export(args)
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
        infer, mode=args.mode or "slide", crop=tuple(crop), stride=tuple(stride),
        window_batch=window_batch, aug_test=args.aug_test,
        depth_max=float(cfg.get("data", {}).get("depth_max", 80.0)),
        model_name=os.path.basename(str(args.config)),
        fetch=args.fetch,
        device_timeout=getattr(args, "device_timeout", 0.0),
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
    server = make_server(service, args.host, args.port,
                         max_body_bytes=int(args.max_body_mb * (1 << 20)))
    origin = args.from_export or f"{args.config} (epoch {epoch})"
    print(f"serving {origin} on "
          f"http://{args.host}:{server.server_address[1]}  "
          f"mode={service.mode} crop={service.crop} stride={service.stride}",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
