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
