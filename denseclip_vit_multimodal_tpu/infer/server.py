"""HTTP serving daemon over a compiled :class:`Inferencer`.

Production-serving counterpart of the reference's interactive
``simple_test``/``aug_test`` surface (reference:
segmentation/denseclip/denseclip.py:938-1041, which is only reachable
through the broken mmseg ``test.py`` there).  Design:

- **One compiled program per (mode, input size)** — requests hit the
  Inferencer's jit cache, so steady-state latency is a single device
  dispatch.  A warmup pass at startup pays the first compile before the
  socket opens.
- **Single-flight device access** — a lock serializes model calls; the
  HTTP layer is threaded (``ThreadingHTTPServer``) so health/metrics
  stay responsive while a frame is in flight.
- **compact host fetches end to end** — only the seg argmax + depth
  cross the host boundary, never the fp32 logit canvas (~160 MB at
  1024x2048; see Inferencer._package).  ``fetch='packed'`` (uint8 seg +
  f16 depth) shrinks the device->host transfer AND the npz response a
  further ~2.7x for bandwidth-constrained links.

Endpoints:

- ``GET /healthz`` — JSON liveness + model/protocol info.
- ``GET /metrics`` — Prometheus text format (request/error counters,
  cumulative inference seconds).
- ``POST /v1/predict`` — body: PNG/JPEG bytes.  Query params:
  ``format=npz|json|png`` (default npz), ``target=seg|depth`` (png
  only), ``mode=whole|slide`` and ``aug=1`` to override the server
  defaults per request.

Pure stdlib (http.server) + PIL: no new dependencies.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np


class ServingStats:
    """Thread-safe counters exported at /metrics (Prometheus text format)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests_total = 0
        self.errors_total = 0
        self.inference_seconds_total = 0.0
        self.images_total = 0

    def record(self, seconds: float, ok: bool, images: int = 1):
        with self._lock:
            self.requests_total += 1
            if ok:
                self.inference_seconds_total += seconds
                self.images_total += images
            else:
                self.errors_total += 1

    def render(self) -> str:
        with self._lock:
            lines = [
                "# TYPE denseclip_requests_total counter",
                f"denseclip_requests_total {self.requests_total}",
                "# TYPE denseclip_errors_total counter",
                f"denseclip_errors_total {self.errors_total}",
                "# TYPE denseclip_images_total counter",
                f"denseclip_images_total {self.images_total}",
                "# TYPE denseclip_inference_seconds_total counter",
                f"denseclip_inference_seconds_total "
                f"{self.inference_seconds_total:.6f}",
            ]
        return "\n".join(lines) + "\n"


class InferenceService:
    """Model-side half of the server: decode -> predict -> encode.

    Kept HTTP-free so tests (and future transports) can call it directly.
    """

    def __init__(
        self,
        inferencer,
        mode: str = "whole",
        crop: Tuple[int, int] = (640, 640),
        stride: Tuple[int, int] = (426, 426),
        window_batch: int = 0,
        aug_test: bool = False,
        depth_max: float = 80.0,
        model_name: str = "denseclip",
        fetch: str = "argmax",
    ):
        self.inferencer = inferencer
        self.mode = mode
        self.crop = tuple(crop)
        self.stride = tuple(stride)
        self.window_batch = window_batch
        self.aug_test = aug_test
        self.depth_max = float(depth_max)
        self.model_name = model_name
        if fetch not in ("argmax", "packed"):
            raise ValueError(
                f"serving fetch must be 'argmax' or 'packed', got {fetch!r}"
            )
        self.fetch = fetch
        self.stats = ServingStats()
        # One frame on device at a time; the jit/program cache inside the
        # Inferencer is not designed for concurrent mutation and a second
        # in-flight frame would only queue behind the first on-chip anyway.
        self._device_lock = threading.Lock()

    # -- core ------------------------------------------------------------

    def predict_array(self, img: np.ndarray, mode: Optional[str] = None,
                      aug: Optional[bool] = None) -> dict:
        """uint8 [H, W, 3] -> {'seg' [H, W], 'depth'? [H, W]}.

        Dtypes follow the service's fetch policy: int32/f32 for 'argmax',
        uint8/f16 for 'packed' (see Inferencer._package).
        """
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(f"expected [H, W, 3] uint8 image, got {img.shape}")
        mode = self.mode if mode is None else mode
        if mode not in ("whole", "slide"):
            raise ValueError(f"unknown mode {mode!r}")
        aug = self.aug_test if aug is None else aug
        kwargs = dict(
            mode=mode, crop=self.crop, stride=self.stride,
            window_batch=self.window_batch, fetch=self.fetch,
        )
        with self._device_lock:
            fn = self.inferencer.aug_test if aug else self.inferencer.predict
            out = fn(img[None], **kwargs)
        res = {"seg": np.asarray(out["seg"][0])}
        if "depth" in out:
            res["depth"] = np.asarray(out["depth"][0])
        return res

    def warmup(self, hw: Tuple[int, int]):
        """Pay the (mode, size) compile before serving traffic."""
        self.predict_array(np.zeros((hw[0], hw[1], 3), np.uint8))

    # -- request plumbing --------------------------------------------------

    def handle_predict(self, body: bytes, query: dict) -> Tuple[int, str, bytes]:
        """Returns (status, content_type, payload)."""
        from PIL import Image

        fmt = query.get("format", ["npz"])[0]
        mode = query.get("mode", [None])[0]
        aug_q = query.get("aug", [None])[0]
        aug = None if aug_q is None else aug_q not in ("0", "false", "")
        t0 = time.perf_counter()
        try:
            img = np.asarray(
                Image.open(io.BytesIO(body)).convert("RGB"), np.uint8
            )
            res = self.predict_array(img, mode=mode, aug=aug)
        except Exception as e:  # noqa: BLE001 — map any decode/infer error to 400
            self.stats.record(0.0, ok=False)
            msg = json.dumps({"error": str(e)}).encode()
            return 400, "application/json", msg
        dt = time.perf_counter() - t0
        self.stats.record(dt, ok=True)

        if fmt == "npz":
            buf = io.BytesIO()
            np.savez(buf, **res)
            return 200, "application/octet-stream", buf.getvalue()
        if fmt == "json":
            # Machine-readable summary, NOT per-pixel (that is what npz is
            # for): shapes, class histogram, depth stats, latency.
            hist = np.bincount(
                res["seg"].ravel(), minlength=self.inferencer.num_classes
            )
            payload = {
                "shape": list(res["seg"].shape),
                "class_pixels": hist.tolist(),
                "latency_s": round(dt, 4),
            }
            if "depth" in res:
                depth = res["depth"].astype(np.float32)
                payload["depth_mean"] = float(depth.mean())
                payload["depth_max"] = float(depth.max())
            return 200, "application/json", json.dumps(payload).encode()
        if fmt == "png":
            from denseclip_vit_multimodal_tpu.utils.visualize import (
                colorize_depth,
                colorize_seg,
            )

            target = query.get("target", ["seg"])[0]
            if target == "depth":
                if "depth" not in res:
                    return 400, "application/json", b'{"error": "no depth head"}'
                panel = colorize_depth(
                    res["depth"].astype(np.float32), self.depth_max
                )
            else:
                panel = colorize_seg(res["seg"])
            buf = io.BytesIO()
            Image.fromarray(panel).save(buf, format="PNG")
            return 200, "image/png", buf.getvalue()
        return 400, "application/json", json.dumps(
            {"error": f"unknown format {fmt!r} (npz|json|png)"}
        ).encode()

    def health(self) -> dict:
        return {
            "status": "ok",
            "model": self.model_name,
            "num_classes": self.inferencer.num_classes,
            "with_depth": bool(self.inferencer.with_depth),
            "mode": self.mode,
            "crop": list(self.crop),
            "stride": list(self.stride),
            "aug_test": self.aug_test,
            "fetch": self.fetch,
        }


def make_server(service: InferenceService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; port 0 = ephemeral."""

    class Handler(BaseHTTPRequestHandler):
        # Keep test/CI logs clean; stats carry the signal.
        def log_message(self, *args):  # noqa: D102
            pass

        def _send(self, status: int, ctype: str, payload: bytes):
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):  # noqa: N802 — http.server API
            path = urlparse(self.path).path
            if path == "/healthz":
                self._send(200, "application/json",
                           json.dumps(service.health()).encode())
            elif path == "/metrics":
                self._send(200, "text/plain; version=0.0.4",
                           service.stats.render().encode())
            else:
                self._send(404, "application/json", b'{"error": "not found"}')

        def do_POST(self):  # noqa: N802
            parsed = urlparse(self.path)
            if parsed.path != "/v1/predict":
                self._send(404, "application/json", b'{"error": "not found"}')
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._send(400, "application/json",
                           b'{"error": "empty body; POST image bytes"}')
                return
            body = self.rfile.read(length)
            status, ctype, payload = service.handle_predict(
                body, parse_qs(parsed.query)
            )
            self._send(status, ctype, payload)

    return ThreadingHTTPServer((host, port), Handler)
