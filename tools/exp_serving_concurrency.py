#!/usr/bin/env python
"""Measure multi-client HTTP serving throughput (r4 VERDICT next-round #2).

Drives the real serving stack — `make_server` + `InferenceService` +
compiled `Inferencer` — with K concurrent HTTP clients POSTing PNG frames,
and reports aggregate images/sec per client count, plus the server's own
device-occupancy accounting (`denseclip_inference_seconds_total` vs wall).

What this isolates: the single-flight device lock serializes device work by
design; concurrency wins can only come from overlapping host-side PNG
decode / npz encode of one request with the device call (and, on this
relay-attached environment, the ~MB/s device->host fetch) of another.
On a production-local TPU the expectation is aggregate ~= device img/s;
HERE the measured ceiling is relay-fetch + 1-CPU-host bound — record both
numbers honestly (docs/PERFORMANCE.md serving section).

Usage: python tools/exp_serving_concurrency.py [--clients 1 4]
       [--requests 6] [--size 1024 2048] [--fetch packed]
"""

import argparse
import io
import json
import threading
import time
from http.client import HTTPConnection

import numpy as np


def _png_frame(h, w, seed=0):
    from PIL import Image

    img = np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config",
                   default="configs/denseclip_vitb16_cityscapes_multitask.yaml")
    p.add_argument("--clients", type=int, nargs="*", default=[1, 4])
    p.add_argument("--requests", type=int, default=6,
                   help="requests PER CLIENT per measurement")
    p.add_argument("--size", type=int, nargs=2, default=[1024, 2048])
    p.add_argument("--fetch", default="packed")
    p.add_argument("--mode", default="slide")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from denseclip_vit_multimodal_tpu.core.config import (
        load_config,
        resolve_test_protocol,
    )
    from denseclip_vit_multimodal_tpu.data.augment import (
        augment_config_from_data_cfg,
    )
    from denseclip_vit_multimodal_tpu.infer.engine import Inferencer
    from denseclip_vit_multimodal_tpu.infer.server import (
        InferenceService,
        make_server,
    )
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        build_denseclip,
    )
    from denseclip_vit_multimodal_tpu.train.loop import class_names_for

    cfg = load_config(args.config)
    crop, stride, window_batch = resolve_test_protocol(cfg, None, None, None)
    class_names = class_names_for(cfg.get("data", {}))
    model, texts = build_denseclip(
        cfg.model, class_names, dtype=jnp.bfloat16,
        attn_impl=str((cfg.get("tpu", {}) or {}).get("attn_impl", "auto")),
    )
    aug_cfg = augment_config_from_data_cfg(cfg.get("data", {}), train=False)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + tuple(crop) + (3,), jnp.float32),
        jnp.asarray(texts),
    )
    infer = Inferencer(
        model, variables, texts, aug_cfg,
        num_classes=len(class_names),
        with_depth=bool(cfg.model.get("depth_head")),
    )
    service = InferenceService(
        infer, mode=args.mode, crop=tuple(crop), stride=tuple(stride),
        window_batch=window_batch, fetch=args.fetch,
        device_timeout=300.0,
    )
    server = make_server(service, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    h, w = args.size
    png = _png_frame(h, w)
    print(f"# frame {h}x{w}, png {len(png) / 1e6:.1f} MB, "
          f"mode={args.mode} crop={crop} fetch={args.fetch}", flush=True)

    def one_request():
        conn = HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/v1/predict?format=npz", body=png,
                     headers={"Content-Type": "image/png"})
        resp = conn.getresponse()
        body = resp.read()
        conn.close()
        assert resp.status == 200, (resp.status, body[:200])
        return len(body)

    t0 = time.perf_counter()
    one_request()  # compile + warm
    print(f"# warmup request {time.perf_counter() - t0:.1f}s", flush=True)
    one_request()  # warm steady-state

    for k in args.clients:
        errs = []
        done = [0]
        lock = threading.Lock()

        def client():
            try:
                for _ in range(args.requests):
                    one_request()
                    with lock:
                        done[0] += 1
            except Exception as e:  # noqa: BLE001 — recorded, not raised
                errs.append(repr(e))

        dev_t0 = service.stats.device_seconds_total
        threads = [threading.Thread(target=client) for _ in range(k)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        dev_dt = service.stats.device_seconds_total - dev_t0
        assert not errs, errs
        n = done[0]
        print(json.dumps({
            "clients": k, "images": n, "wall_s": round(wall, 2),
            "images_per_sec": round(n / wall, 3),
            # lock-HELD seconds / wall: true single-flight device busy
            # fraction (inference_seconds_total would sum lock WAITS
            # across clients and exceed 100%)
            "device_occupancy_pct": round(100 * dev_dt / wall, 1),
        }), flush=True)

    server.shutdown()


if __name__ == "__main__":
    main()
