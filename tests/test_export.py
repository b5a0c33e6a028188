"""Serving export round trip: AOT StableHLO program + weights bundle.

tools/export.py serializes the jitted inference program (jax.export) so a
serving process can run it WITHOUT the model-building code.  The round trip
must reproduce the in-process model bit-for-bit: same preprocessing
(uint8 -> CLIP-normalized), same outputs (seg logits + depth channel).
No reference equivalent (the reference serves by importing training code).
"""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

TINY = [
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
    "data.crop_size=[64,128]",
]


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    import export as export_tool

    from denseclip_vit_multimodal_tpu.core.config import load_config
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        CITYSCAPES_CLASSES, build_denseclip,
    )
    from denseclip_vit_multimodal_tpu.train import checkpoint as ckpt_lib
    from denseclip_vit_multimodal_tpu.train.state import create_train_state

    root = tmp_path_factory.mktemp("export")
    cfg = load_config("configs/denseclip_vitb16_cityscapes_multitask.yaml",
                      overrides=TINY)
    model, texts = build_denseclip(cfg.model, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 64, 128, 3)), jnp.asarray(texts)
    )
    state = create_train_state(model, variables, cfg.get("training", {}), 1)
    work = str(root / "work")
    ckpt_lib.save_checkpoint(work, state, 0, 0.0)

    out = str(root / "bundle")
    export_tool.main([
        "configs/denseclip_vitb16_cityscapes_multitask.yaml", work, out,
        "--shape", "64", "128", "--mode", "whole",
        # fp32 so the round trip is comparable to the fp32-built reference
        # model below at tight tolerance
        "--set", *TINY, "tpu.compute_dtype=float32",
    ])
    return out, model, variables, texts


def test_export_bundle_contents(export_dir):
    out, *_ = export_dir
    assert os.path.exists(os.path.join(out, "program.bin"))
    assert os.path.exists(os.path.join(out, "weights.npz"))
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["input_shape"] == [1, 64, 128, 3]
    assert meta["num_outputs"] == 20  # 19 classes + depth
    assert len(meta["class_names"]) == 19


def test_export_round_trip_matches_model(export_dir):
    from jax import export as jexport

    out, model, variables, texts = export_dir
    meta = json.load(open(os.path.join(out, "meta.json")))
    with open(os.path.join(out, "program.bin"), "rb") as f:
        program = jexport.deserialize(f.read())
    weights = np.load(os.path.join(out, "weights.npz"))
    flat = [jnp.asarray(weights[k]) for k in meta["weight_keys"]]

    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 255, (1, 64, 128, 3)).astype(np.uint8)
    got = np.asarray(program.call(*flat, jnp.asarray(img_u8)))

    # same math in-process: normalize exactly like the export's infer_fn
    from denseclip_vit_multimodal_tpu.data.augment import (
        augment_config_from_data_cfg,
    )
    from denseclip_vit_multimodal_tpu.core.config import load_config

    cfg = load_config("configs/denseclip_vitb16_cityscapes_multitask.yaml",
                      overrides=TINY)
    aug = augment_config_from_data_cfg(cfg.get("data", {}), train=False)
    pre = (img_u8.astype(np.float32) / 255.0 - np.asarray(aug.norm_mean)) \
        / np.asarray(aug.norm_std)
    ref = model.apply(variables, jnp.asarray(pre), jnp.asarray(texts),
                      train=False)
    want = np.concatenate(
        [np.asarray(ref["seg"], np.float32),
         np.asarray(ref["depth"], np.float32)], axis=-1,
    )
    assert got.shape == want.shape == (1, 64, 128, 20)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_selftest_cli(export_dir, capsys):
    import export as export_tool

    out, *_ = export_dir
    export_tool.main(["--load", out, "--selftest"])
    assert "self-test OK" in capsys.readouterr().out


def test_exported_inferencer_matches_live_inferencer(export_dir):
    """ExportedInferencer (bundle-only, no model code) must reproduce the
    live Inferencer's packaged outputs on the same frame."""
    from denseclip_vit_multimodal_tpu.data.augment import AugmentConfig
    from denseclip_vit_multimodal_tpu.infer.engine import Inferencer
    from denseclip_vit_multimodal_tpu.infer.exported import ExportedInferencer

    out, model, variables, texts = export_dir
    exported = ExportedInferencer(out)
    assert exported.num_classes == 19 and exported.with_depth is True
    assert exported.mode == "whole" and exported.input_shape == (1, 64, 128, 3)

    img = np.random.RandomState(3).randint(0, 255, (1, 64, 128, 3), np.uint8)
    got = exported.predict(img, mode="whole", fetch="argmax")

    live = Inferencer(
        model, variables, texts, AugmentConfig(crop_size=(64, 128)),
        num_classes=19, with_depth=True,
    ).predict(img, mode="whole", fetch="argmax")
    np.testing.assert_array_equal(got["seg"], live["seg"])
    np.testing.assert_allclose(got["depth"], live["depth"], atol=1e-5)

    # specialization is enforced, not silently re-traced
    with pytest.raises(ValueError, match="specialized"):
        exported.predict(img[:, :32], mode="whole")
    with pytest.raises(ValueError, match="mode"):
        exported.predict(img, mode="slide")
    with pytest.raises(ValueError, match="aug_test"):
        exported.aug_test(img)
    # float frames must be REJECTED, not silently uint8-truncated to
    # near-black garbage (the live engine normalizes floats; this
    # program bakes uint8-in preprocessing)
    with pytest.raises(ValueError, match="uint8"):
        exported.predict(img.astype(np.float32) / 255.0, mode="whole")


def test_serve_from_export_socket_parity(export_dir, tmp_path):
    """VERDICT r4 #4: export -> serve --from-export -> npz over a real
    socket must match config+checkpoint serving byte-for-byte (seg) on
    the same frame — deployment needs no model-building code."""
    import io
    import threading
    from http.client import HTTPConnection

    from PIL import Image

    import serve as serve_tool
    from denseclip_vit_multimodal_tpu.infer.server import make_server

    out, model, variables, texts = export_dir
    work = os.path.join(os.path.dirname(out), "work")

    args = serve_tool.parse_args(["--from-export", out])
    service, epoch = serve_tool.build_service(args)
    assert epoch is None
    assert service.mode == "whole"
    assert service.model_name  # carried from meta.json
    server = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]

    img = np.random.RandomState(11).randint(0, 255, (64, 128, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/v1/predict", body=buf.getvalue(),
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200
        conn.close()
    finally:
        server.shutdown()
        server.server_close()
    got = np.load(io.BytesIO(data))

    # the reference path: config + checkpoint service on the same frame
    cfg_args = serve_tool.parse_args([
        "configs/denseclip_vitb16_cityscapes_multitask.yaml", work,
        "--mode", "whole",
        "--set", *TINY, "tpu.compute_dtype=float32",
    ])
    cfg_service, _ = serve_tool.build_service(cfg_args)
    want = cfg_service.predict_array(img)
    np.testing.assert_array_equal(got["seg"], want["seg"])
    np.testing.assert_allclose(got["depth"], want["depth"], atol=1e-5)


def test_export_baked_packed_fetch(export_dir, tmp_path):
    """--fetch packed bakes uint8 seg + f16 depth INTO the program; the
    loader enforces the baked policy and matches the logits export."""
    import export as export_tool

    from denseclip_vit_multimodal_tpu.infer.exported import ExportedInferencer

    out, *_ = export_dir
    work = os.path.join(os.path.dirname(out), "work")
    packed_dir = str(tmp_path / "packed")
    export_tool.main([
        "configs/denseclip_vitb16_cityscapes_multitask.yaml", work, packed_dir,
        "--shape", "64", "128", "--mode", "whole", "--fetch", "packed",
        "--set", *TINY, "tpu.compute_dtype=float32",
    ])
    meta = json.load(open(os.path.join(packed_dir, "meta.json")))
    assert meta["fetch"] == "packed" and meta["with_depth"] is True

    packed = ExportedInferencer(packed_dir)
    baseline = ExportedInferencer(out)
    img = np.random.RandomState(5).randint(0, 255, (1, 64, 128, 3), np.uint8)
    got = packed.predict(img, mode="whole", fetch="packed")
    want = baseline.predict(img, mode="whole", fetch="argmax")
    assert got["seg"].dtype == np.uint8 and got["depth"].dtype == np.float16
    np.testing.assert_array_equal(got["seg"], want["seg"].astype(np.uint8))
    np.testing.assert_allclose(
        got["depth"].astype(np.float32), want["depth"], rtol=2e-3, atol=1e-3
    )
    with pytest.raises(ValueError, match="baked"):
        packed.predict(img, mode="whole", fetch="argmax")
