"""Config system: _base_ composition, deep merge, overrides, dot access.

The reference's YAML loader ignores `_base_:` keys entirely
(reference: segmentation/train_denseclip.py:1584-1586 — plain safe_load);
ours implements the composition its configs clearly intended
(segmentation/configs/denseclip_multitask_cityscapes.yaml:5-6).
"""

import pytest
import yaml

from denseclip_vit_multimodal_tpu.core.config import (
    Config,
    apply_overrides,
    load_config,
)


def _write(tmp_path, name, data):
    p = tmp_path / name
    p.write_text(yaml.safe_dump(data))
    return p


def test_base_composition(tmp_path):
    _write(
        tmp_path,
        "base.yaml",
        {"data": {"classes": 19, "crop_size": [512, 1024]}, "training": {"epochs": 100}},
    )
    child = tmp_path / "child.yaml"
    child.write_text(
        "_base_: base.yaml\n"
        "training:\n  epochs: 50\n  batch_size: 8\n"
    )
    cfg = load_config(child)
    assert cfg.data.classes == 19
    assert cfg.data.crop_size == [512, 1024]
    assert cfg.training.epochs == 50  # child overrides
    assert cfg.training.batch_size == 8


def test_multi_base_order(tmp_path):
    _write(tmp_path, "a.yaml", {"x": 1, "y": 1})
    _write(tmp_path, "b.yaml", {"y": 2, "z": 2})
    child = tmp_path / "c.yaml"
    child.write_text("_base_: [a.yaml, b.yaml]\nz: 3\n")
    cfg = load_config(child)
    assert cfg.x == 1 and cfg.y == 2 and cfg.z == 3


def test_delete_key(tmp_path):
    _write(tmp_path, "base.yaml", {"model": {"neck": {"type": "FPN"}}})
    child = tmp_path / "c.yaml"
    child.write_text("_base_: base.yaml\nmodel:\n  neck: __delete__\n")
    cfg = load_config(child)
    assert "neck" not in cfg.model


def test_circular_base_detected(tmp_path):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text("_base_: b.yaml\n")
    b.write_text("_base_: a.yaml\n")
    with pytest.raises(ValueError):
        load_config(a)


def test_overrides():
    cfg = {"training": {"optimizer": {"lr": 2e-5}}}
    apply_overrides(cfg, ["training.optimizer.lr=1e-4", "training.epochs=10"])
    assert cfg["training"]["optimizer"]["lr"] == 1e-4
    assert cfg["training"]["epochs"] == 10


def test_dot_access_and_get():
    cfg = Config({"a": {"b": {"c": 3}}})
    assert cfg.a.b.c == 3
    assert cfg.a.get("missing", 7) == 7
    assert cfg.get("a").get("b").c == 3


def test_resolve_test_protocol_defaults_and_overrides():
    from denseclip_vit_multimodal_tpu.core.config import (
        load_config,
        resolve_test_protocol,
    )

    # no test: section -> reference mmseg protocol
    crop, stride, wb = resolve_test_protocol({})
    assert (crop, stride, wb) == ([640, 640], [426, 426], 0)

    # ViT-L preset carries its measured protocol (crop 630 = 45*14 pads
    # tokens to exactly 2048; window_batch 10 bounds the HBM working set)
    cfg = load_config("configs/denseclip_vitl14_cityscapes_multitask.yaml")
    crop, stride, wb = resolve_test_protocol(cfg)
    assert (crop, stride, wb) == ([630, 630], [426, 426], 10)

    # explicit CLI values win over the config
    crop, stride, wb = resolve_test_protocol(
        cfg, crop=[644, 644], window_batch=0
    )
    assert crop == [644, 644] and stride == [426, 426] and wb == 0

    # ViT-B flagship carries the pad-exact serving protocol (crop 624 =
    # 39x39+1 = 1522 tokens -> kernel pad 1536; same 2x5 window grid as
    # the reference's 640, +12.8% measured) + the wb-20 execution default
    cfg_b = load_config("configs/denseclip_vitb16_cityscapes_multitask.yaml")
    assert resolve_test_protocol(cfg_b) == ([624, 624], [426, 426], 20)

    # The heritage 640 preset IS the reference protocol and must stay 640:
    # it _base_-includes the flagship, whose native `crop: [624, 624]` the
    # deep-merge keeps (and `crop` beats the mmseg `crop_size` spelling),
    # so the preset must pin `crop` explicitly — regression for the silent
    # 624 inheritance found in round-4 review.
    cfg_h = load_config("configs/denseclip_vitb16_640x640_80k.yaml")
    assert resolve_test_protocol(cfg_h)[0] == [640, 640]

    # The seg-only serving variant pins 624 EXPLICITLY (intentional, not
    # inherited) so a future flagship-protocol edit can't change its eval
    # protocol invisibly through the _base_ deep-merge.
    cfg_s = load_config("configs/denseclip_vitb16_cityscapes_seg.yaml")
    assert resolve_test_protocol(cfg_s)[:2] == ([624, 624], [426, 426])


def test_resolve_test_protocol_accepts_mmseg_crop_size_spelling():
    from denseclip_vit_multimodal_tpu.core.config import resolve_test_protocol

    crop, stride, wb = resolve_test_protocol(
        {"test": {"crop_size": [512, 512], "stride": [341, 341]}}
    )
    assert (crop, stride, wb) == ([512, 512], [341, 341], 0)
