"""Serving daemon tests: real HTTP round trips against a tiny model.

Covers the full request path — PNG bytes over a socket -> decode ->
compiled predict -> npz/json/png responses — plus health, metrics, and
error mapping.  Serving-surface analog of the reference's inference entry
(reference: segmentation/denseclip/denseclip.py:938-1041).
"""

import io
import json
import threading
from http.client import HTTPConnection

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def serve_fixture(tiny_model_cfg):
    from PIL import Image

    from denseclip_vit_multimodal_tpu.data.augment import AugmentConfig
    from denseclip_vit_multimodal_tpu.infer.engine import Inferencer
    from denseclip_vit_multimodal_tpu.infer.server import (
        InferenceService,
        make_server,
    )
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        CITYSCAPES_CLASSES,
        build_denseclip,
    )

    model, texts = build_denseclip(tiny_model_cfg, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64, 3), jnp.float32),
        jnp.asarray(texts),
    )
    infer = Inferencer(
        model, variables, texts,
        AugmentConfig(crop_size=(32, 64)), num_classes=19, with_depth=True,
    )
    service = InferenceService(
        infer, mode="whole", crop=(32, 64), stride=(24, 48),
        model_name="tiny-test",
    )
    server = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    img = np.random.RandomState(0).randint(
        0, 255, (32, 64, 3), dtype=np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")

    yield {
        "port": server.server_address[1],
        "service": service,
        "png": buf.getvalue(),
        "img": img,
    }
    server.shutdown()
    server.server_close()


def _request(port, method, path, body=None):
    conn = HTTPConnection("127.0.0.1", port, timeout=120)
    headers = {"Content-Type": "application/octet-stream"} if body else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    status, ctype = resp.status, resp.getheader("Content-Type")
    conn.close()
    return status, ctype, data


def test_healthz(serve_fixture):
    status, ctype, data = _request(serve_fixture["port"], "GET", "/healthz")
    assert status == 200 and ctype == "application/json"
    info = json.loads(data)
    assert info["status"] == "ok"
    assert info["num_classes"] == 19 and info["with_depth"] is True
    assert info["mode"] == "whole" and info["crop"] == [32, 64]


def test_predict_npz_round_trip(serve_fixture):
    """npz is the machine contract: seg argmax + depth at input size, and
    the HTTP result must equal a direct Inferencer call on the same image."""
    status, ctype, data = _request(
        serve_fixture["port"], "POST", "/v1/predict", serve_fixture["png"]
    )
    assert status == 200 and ctype == "application/octet-stream"
    out = np.load(io.BytesIO(data))
    assert out["seg"].shape == (32, 64) and out["seg"].dtype == np.int32
    assert out["depth"].shape == (32, 64) and out["depth"].dtype == np.float32
    assert 0 <= out["seg"].min() and out["seg"].max() < 19

    direct = serve_fixture["service"].predict_array(serve_fixture["img"])
    np.testing.assert_array_equal(out["seg"], direct["seg"])
    np.testing.assert_allclose(out["depth"], direct["depth"], rtol=1e-6)


def test_predict_json_summary(serve_fixture):
    status, ctype, data = _request(
        serve_fixture["port"], "POST", "/v1/predict?format=json",
        serve_fixture["png"],
    )
    assert status == 200 and ctype == "application/json"
    payload = json.loads(data)
    assert payload["shape"] == [32, 64]
    assert len(payload["class_pixels"]) == 19
    assert sum(payload["class_pixels"]) == 32 * 64
    assert "depth_mean" in payload and payload["latency_s"] >= 0


def test_predict_png_panels(serve_fixture):
    from PIL import Image

    for target in ("seg", "depth"):
        status, ctype, data = _request(
            serve_fixture["port"], "POST",
            f"/v1/predict?format=png&target={target}", serve_fixture["png"],
        )
        assert status == 200 and ctype == "image/png", target
        panel = Image.open(io.BytesIO(data))
        assert panel.size == (64, 32)  # PIL is (W, H)


def test_slide_mode_override_matches_direct(serve_fixture):
    """Per-request ?mode=slide runs the slide engine at the server's
    crop/stride and must equal a direct slide predict."""
    status, _, data = _request(
        serve_fixture["port"], "POST", "/v1/predict?mode=slide",
        serve_fixture["png"],
    )
    assert status == 200
    out = np.load(io.BytesIO(data))
    direct = serve_fixture["service"].inferencer.predict(
        serve_fixture["img"][None], mode="slide", crop=(32, 64),
        stride=(24, 48), fetch="argmax",
    )
    np.testing.assert_array_equal(out["seg"], direct["seg"][0])


def test_bad_requests_are_400_and_counted(serve_fixture):
    before = serve_fixture["service"].stats.errors_total
    # corrupt image bytes
    status, _, data = _request(
        serve_fixture["port"], "POST", "/v1/predict", b"not an image"
    )
    assert status == 400 and b"error" in data
    # unknown format
    status, _, _ = _request(
        serve_fixture["port"], "POST", "/v1/predict?format=bmp",
        serve_fixture["png"],
    )
    assert status == 400
    # unknown mode
    status, _, _ = _request(
        serve_fixture["port"], "POST", "/v1/predict?mode=diagonal",
        serve_fixture["png"],
    )
    assert status == 400
    # empty body
    status, _, _ = _request(serve_fixture["port"], "POST", "/v1/predict")
    assert status == 400
    assert serve_fixture["service"].stats.errors_total >= before + 2
    # unknown path
    status, _, _ = _request(serve_fixture["port"], "GET", "/nope")
    assert status == 404


def test_metrics_exposition(serve_fixture):
    status, ctype, data = _request(serve_fixture["port"], "GET", "/metrics")
    assert status == 200 and ctype.startswith("text/plain")
    text = data.decode()
    assert "denseclip_requests_total" in text
    assert "denseclip_inference_seconds_total" in text
    # counters reflect the traffic this module generated
    served = {
        line.split()[0]: float(line.split()[1])
        for line in text.splitlines()
        if line and not line.startswith("#")
    }
    assert served["denseclip_requests_total"] >= 4
    assert served["denseclip_errors_total"] >= 2
    # device-busy counter: lock-HELD seconds only (includes warmup, which
    # the per-request counter does not — so no ordering between the two)
    assert 0.0 < served["denseclip_device_seconds_total"]


def test_packed_fetch_service(serve_fixture):
    """fetch='packed' serves uint8 seg + f16 depth with identical argmax
    content — the bandwidth-saving serving policy."""
    from denseclip_vit_multimodal_tpu.infer.server import InferenceService

    base = serve_fixture["service"]
    packed = InferenceService(
        base.inferencer, mode="whole", crop=base.crop, stride=base.stride,
        fetch="packed",
    )
    res_p = packed.predict_array(serve_fixture["img"])
    res_a = base.predict_array(serve_fixture["img"])
    assert res_p["seg"].dtype == np.uint8
    assert res_p["depth"].dtype == np.float16
    np.testing.assert_array_equal(res_p["seg"], res_a["seg"].astype(np.uint8))
    np.testing.assert_allclose(
        res_p["depth"].astype(np.float32), res_a["depth"],
        rtol=2e-3, atol=1e-3)
    assert packed.health()["fetch"] == "packed"

    with pytest.raises(ValueError, match="fetch"):
        InferenceService(base.inferencer, fetch="logits")


def test_cli_build_service_from_checkpoint(tmp_path):
    """tools/serve.py wiring: config + Orbax checkpoint -> working service.

    Covers the path a real operator hits first — protocol resolution from
    the config `test:` section, checkpoint restore into the Inferencer,
    and one end-to-end predict on the assembled service."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import serve as serve_tool

    from denseclip_vit_multimodal_tpu.core.config import load_config
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        CITYSCAPES_CLASSES,
        build_denseclip,
    )
    from denseclip_vit_multimodal_tpu.train import checkpoint as ckpt_lib
    from denseclip_vit_multimodal_tpu.train.state import create_train_state

    tiny = [
        "model.backbone.width=32", "model.backbone.layers=2",
        "model.backbone.heads=2", "model.backbone.out_indices=[0,1]",
        "model.backbone.patch_size=16",
        "model.text_encoder.transformer_layers=2",
        "model.text_encoder.transformer_width=32",
        "model.text_encoder.transformer_heads=2",
        "model.text_encoder.embed_dim=16", "model.text_dim=16",
        "model.token_embed_dim=32",
        "model.context_decoder.transformer_width=16",
        "model.context_decoder.transformer_heads=2",
        "model.context_decoder.transformer_layers=1",
        "model.neck.inter_channels=8", "model.neck.out_channels=16",
        "model.decode_head.in_channels=16", "model.decode_head.channels=16",
        "model.depth_head.in_channels=16", "model.depth_head.channels=8",
        "data.crop_size=[32,64]", "tpu.compute_dtype=float32",
    ]
    cfg = load_config("configs/denseclip_vitb16_cityscapes_multitask.yaml",
                      overrides=tiny)
    model, texts = build_denseclip(cfg.model, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 32, 64, 3)), jnp.asarray(texts)
    )
    state = create_train_state(model, variables, cfg.get("training", {}), 1)
    work = str(tmp_path / "work")
    ckpt_lib.save_checkpoint(work, state, epoch=2, best_metric=0.1)

    args = serve_tool.parse_args([
        "configs/denseclip_vitb16_cityscapes_multitask.yaml", work,
        "--mode", "whole", "--crop", "32", "64", "--stride", "24", "48",
        "--set", *tiny,
    ])
    service, epoch = serve_tool.build_service(args)
    assert epoch == 2
    assert service.mode == "whole" and service.crop == (32, 64)
    health = service.health()
    assert health["num_classes"] == 19 and health["with_depth"] is True

    img = np.random.RandomState(1).randint(0, 255, (32, 64, 3), np.uint8)
    res = service.predict_array(img)
    assert res["seg"].shape == (32, 64) and res["depth"].shape == (32, 64)
    assert np.isfinite(res["depth"]).all()


def _png_bytes(h=8, w=8, seed=0):
    from PIL import Image

    img = np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


class _FakeInferencer:
    """Inferencer stand-in: optional gate (hang) / fail (raise) injection."""

    num_classes = 19
    with_depth = False

    def __init__(self, gate=None, fail=None):
        self.gate = gate
        self.fail = fail
        self.calls = 0
        self.last_aug = None

    def _run(self, img, aug):
        self.calls += 1
        self.last_aug = aug
        if self.fail is not None:
            raise self.fail
        if self.gate is not None:
            self.gate.wait()
        return {"seg": np.zeros((1,) + img.shape[1:3], np.int32)}

    def predict(self, img, **kw):
        return self._run(img, aug=False)

    def aug_test(self, img, **kw):
        return self._run(img, aug=True)


def test_device_timeout_returns_503_and_degrades_health():
    """A wedged device call must 503 (not hang the client), flip /healthz
    to degraded with the in-flight age, fail fast while wedged, and
    recover once the device drains — the relay-wedge scenario from this
    repo's own working notes (r4 VERDICT weak #4)."""
    import time as _time

    from denseclip_vit_multimodal_tpu.infer.server import InferenceService

    gate = threading.Event()
    fake = _FakeInferencer(gate=gate)
    svc = InferenceService(fake, mode="whole", device_timeout=0.3)
    png = _png_bytes()
    try:
        h0 = svc.health()
        assert h0["status"] == "ok" and h0["last_success_age_s"] is None

        status, _, payload = svc.handle_predict(png, {})
        assert status == 503 and b"deadline" in payload
        assert svc.stats.timeouts_total == 1
        assert svc.stats.errors_total == 1

        # On a loaded 1-CPU host the worker thread may not have STARTED
        # the device call when the future deadline fired — poll until the
        # blocked call registers as in-flight and ages past the deadline.
        deadline0 = _time.monotonic() + 10.0
        while True:
            h = svc.health()
            if h["status"] == "degraded":
                break
            assert _time.monotonic() < deadline0, f"never degraded: {h}"
            _time.sleep(0.05)
        assert h["inflight_age_s"] is not None and h["inflight_age_s"] > 0.3
        assert h["last_success_age_s"] is None
        assert h["timeouts_total"] == 1

        # While the wedged call is still in flight, the next request fails
        # FAST instead of waiting out another full deadline.
        t0 = _time.monotonic()
        status, _, _ = svc.handle_predict(png, {})
        assert status == 503
        assert _time.monotonic() - t0 < 0.25
    finally:
        gate.set()  # always drain the worker so pytest can exit

    deadline = _time.monotonic() + 10.0
    while svc.health()["inflight_age_s"] is not None:
        assert _time.monotonic() < deadline, "worker never drained"
        _time.sleep(0.01)

    status, _, data = svc.handle_predict(png, {})
    assert status == 200
    h = svc.health()
    assert h["status"] == "ok" and h["last_success_age_s"] is not None
    out = np.load(io.BytesIO(data))
    assert out["seg"].shape == (8, 8)


def test_abandoned_queued_call_never_dispatches():
    """A request whose deadline expires while QUEUED behind an in-flight
    call must never reach the device afterwards — otherwise every
    abandoned request replays through the device with nobody waiting,
    a self-amplifying backlog (r5 review finding)."""
    import time as _time

    from denseclip_vit_multimodal_tpu.infer.server import InferenceService

    gate = threading.Event()
    fake = _FakeInferencer(gate=gate)
    svc = InferenceService(fake, mode="whole", device_timeout=2.0)
    png = _png_bytes()
    try:
        # A: dispatches and blocks on the gate (holds the device lock).
        a = threading.Thread(
            target=lambda: svc.handle_predict(png, {}), daemon=True
        )
        a.start()
        deadline = _time.monotonic() + 10.0
        while fake.calls < 1:
            assert _time.monotonic() < deadline, "A never dispatched"
            _time.sleep(0.01)

        # B: queues behind A, times out end-to-end, gets 503 — and must
        # have WAITED (queued path), not failed fast on the wedge check.
        t0 = _time.monotonic()
        status, _, _ = svc.handle_predict(png, {})
        waited = _time.monotonic() - t0
        assert status == 503
    finally:
        gate.set()
    a.join(timeout=30)

    deadline = _time.monotonic() + 10.0
    while svc.health()["inflight_age_s"] is not None:
        assert _time.monotonic() < deadline, "worker never drained"
        _time.sleep(0.01)
    # B was abandoned in the queue: only A's dispatch ever ran...
    if waited >= 1.5:  # (on a loaded host B may instead fail fast pre-queue)
        assert fake.calls == 1
    # ...and the service still serves fresh requests afterwards.
    status, _, _ = svc.handle_predict(png, {})
    assert status == 200
    assert fake.calls >= 2


def test_param_errors_cost_no_device_dispatch():
    """Unknown format/mode/aug/target must 400 and increment errors BEFORE
    any device work (ADVICE r4: a bad ?format= used to run a full slide
    inference, record it as ok, then 400)."""
    from denseclip_vit_multimodal_tpu.infer.server import InferenceService

    fake = _FakeInferencer()
    svc = InferenceService(fake, mode="whole")
    png = _png_bytes()
    bad_queries = [
        {"format": ["bmp"]},
        {"mode": ["diagonal"]},
        {"aug": ["maybe"]},
        {"format": ["png"], "target": ["sideways"]},
    ]
    for q in bad_queries:
        status, _, payload = svc.handle_predict(png, q)
        assert status == 400, q
        assert b"error" in payload
    assert fake.calls == 0
    assert svc.stats.errors_total == len(bad_queries)
    assert svc.stats.requests_total == len(bad_queries)
    assert svc.stats.inference_seconds_total == 0.0

    # decoded-size cap (decompression-bomb guard): valid PNG, too many px
    svc_small = InferenceService(fake, mode="whole", max_pixels=16)
    status, _, payload = svc_small.handle_predict(png, {})
    assert status == 400 and b"exceeds" in payload
    assert fake.calls == 0


def test_aug_flag_parsing_is_case_insensitive():
    """aug=no / aug=FALSE must NOT silently enable the much slower
    multi-scale path (ADVICE r4)."""
    from denseclip_vit_multimodal_tpu.infer.server import InferenceService

    fake = _FakeInferencer()
    svc = InferenceService(fake, mode="whole")
    png = _png_bytes()
    for val, want_aug in [("no", False), ("FALSE", False), ("off", False),
                          ("1", True), ("YES", True), ("on", True)]:
        status, _, _ = svc.handle_predict(png, {"aug": [val]})
        assert status == 200, val
        assert fake.last_aug is want_aug, val


def test_server_fault_maps_to_500_client_fault_to_400():
    """ValueError = client's fault (400); anything else = ours (500) —
    so monitoring can tell a relay outage from bad input (ADVICE r4)."""
    from denseclip_vit_multimodal_tpu.infer.server import InferenceService

    png = _png_bytes()
    svc = InferenceService(_FakeInferencer(fail=RuntimeError("boom")),
                           mode="whole")
    status, _, payload = svc.handle_predict(png, {})
    assert status == 500 and b"internal" in payload
    assert svc.stats.errors_total == 1

    svc = InferenceService(_FakeInferencer(fail=ValueError("bad shape")),
                           mode="whole")
    status, _, payload = svc.handle_predict(png, {})
    assert status == 400 and b"bad shape" in payload


def test_body_cap_and_malformed_content_length():
    """Transport-layer guards: oversized bodies 413 before any decode;
    a garbage Content-Length answers 400, not a connection reset."""
    import socket

    from denseclip_vit_multimodal_tpu.infer.server import (
        InferenceService,
        make_server,
    )

    svc = InferenceService(_FakeInferencer(), mode="whole")
    server = make_server(svc, "127.0.0.1", 0, max_body_bytes=1000)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    try:
        status, _, data = _request(
            port, "POST", "/v1/predict", b"x" * 2000
        )
        assert status == 413 and b"limit" in data

        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall(b"POST /v1/predict HTTP/1.1\r\nHost: t\r\n"
                      b"Content-Length: banana\r\n\r\n")
            first = s.recv(4096).split(b"\r\n", 1)[0]
        assert b"400" in first
    finally:
        server.shutdown()
        server.server_close()


def test_concurrent_requests_single_flight(serve_fixture):
    """The device lock serializes inference; concurrent clients must all
    succeed with identical results."""
    results = []
    errors = []

    def hit():
        try:
            status, _, data = _request(
                serve_fixture["port"], "POST", "/v1/predict",
                serve_fixture["png"],
            )
            assert status == 200
            results.append(np.load(io.BytesIO(data))["seg"])
        except Exception as e:  # noqa: BLE001 — collected for the main thread
            errors.append(e)

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors and len(results) == 4
    for seg in results[1:]:
        np.testing.assert_array_equal(seg, results[0])
