"""Preset build tests: every shipped config must construct a model and a
schedule, and the iteration-based schedule presets must carry the reference
hyperparameters (reference: segmentation/configs/_base_/schedules/*.py and
configs/denseclip_fpn_res101_512x512_80k.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from denseclip_vit_multimodal_tpu.core.config import (
    builtin_config_dir,
    load_config,
)
from denseclip_vit_multimodal_tpu.models.denseclip import build_denseclip
from denseclip_vit_multimodal_tpu.train.schedules import build_schedule

from denseclip_vit_multimodal_tpu.data.ade20k import ADE20K_CLASSES as ADE_CLASSES


def _class_names(cfg):
    n = int(cfg.get("data", {}).get("classes", 19) or 19)
    if n == 150:
        return ADE_CLASSES
    from denseclip_vit_multimodal_tpu.models.denseclip import CITYSCAPES_CLASSES

    return CITYSCAPES_CLASSES


@pytest.mark.parametrize(
    "preset", sorted(p.name for p in builtin_config_dir().glob("*.yaml"))
)
def test_preset_builds_model_and_schedule(preset):
    cfg = load_config(builtin_config_dir() / preset)
    model, texts = build_denseclip(cfg.model, _class_names(cfg))
    assert texts.ndim == 2
    schedule = build_schedule(cfg.get("training", {}) or {}, steps_per_epoch=100)
    lr0 = float(schedule(jnp.asarray(0)))
    assert np.isfinite(lr0) and lr0 >= 0.0


class TestSchedulePresets:
    @pytest.mark.parametrize(
        "name,iters,min_lr",
        # min_lr values per reference _base_/schedules/schedule_*.py
        # (the 80k preset is 1e-6 there, unlike its 20k/40k siblings)
        [("20k", 20000, 1e-4), ("40k", 40000, 1e-4),
         ("80k", 80000, 1e-6), ("160k", 160000, 1e-5)],
    )
    def test_iteration_schedules(self, name, iters, min_lr):
        cfg = load_config(
            builtin_config_dir() / "_base_" / "schedules" / f"schedule_{name}.yaml"
        )
        tr = cfg.training
        assert int(tr.iters) == iters
        assert float(tr.scheduler.min_lr) == pytest.approx(min_lr)
        schedule = build_schedule(tr, steps_per_epoch=1)
        base_lr = float(tr.optimizer.lr)
        # poly decay reaches min_lr at the end of the run
        assert float(schedule(jnp.asarray(iters))) == pytest.approx(min_lr, rel=1e-5)
        mid = float(schedule(jnp.asarray(iters // 2)))
        assert min_lr < mid < base_lr

    def test_polylr_alias_with_warmup_iters(self):
        """The heritage presets use `type: PolyLR` + `warmup_iters`; both
        spellings must build (this was a latent round-1 bug)."""
        tr = {
            "iters": 1000,
            "optimizer": {"lr": 1e-4},
            "scheduler": {
                "type": "PolyLR",
                "power": 0.9,
                "warmup": "linear",
                "warmup_iters": 100,
                "warmup_ratio": 1e-6,
            },
        }
        schedule = build_schedule(tr, steps_per_epoch=1)
        assert float(schedule(jnp.asarray(0))) == pytest.approx(1e-10, rel=1e-3)
        assert float(schedule(jnp.asarray(100))) == pytest.approx(
            1e-4 * (0.9) ** 0.9, rel=1e-3
        )

    def test_training_iters_drives_total_steps(self):
        tr = {
            "iters": 500,
            "optimizer": {"lr": 1e-2},
            "scheduler": {"type": "PolyLR", "power": 1.0, "warmup_iters": 0},
        }
        schedule = build_schedule(tr, steps_per_epoch=10_000)
        # linear decay over 500 steps, NOT over epochs*steps_per_epoch
        assert float(schedule(jnp.asarray(250))) == pytest.approx(5e-3, rel=1e-5)


class TestParamwiseSchema:
    def test_paramwise_lr_mults_accepted(self):
        from denseclip_vit_multimodal_tpu.train.state import _lr_mults_from_cfg

        cfg = {
            "paramwise": {
                "backbone_lr_mult": 0.1,
                "text_encoder_lr_mult": 0.0,
                "norm_decay_mult": 0.0,
            }
        }
        mults = _lr_mults_from_cfg(cfg.get)
        assert mults == {"backbone": 0.1, "text_encoder": 0.0}

    def test_explicit_lr_mults_win(self):
        from denseclip_vit_multimodal_tpu.train.state import _lr_mults_from_cfg

        cfg = {
            "lr_mults": {"backbone": 0.5},
            "paramwise": {"backbone_lr_mult": 0.1},
        }
        assert _lr_mults_from_cfg(cfg.get)["backbone"] == 0.5


def test_rn101_preset_matches_reference_topology():
    """configs/denseclip_fpn_res101_512x512_80k.py parity: layer counts,
    dims, score-concat, schedule."""
    cfg = load_config(builtin_config_dir() / "denseclip_rn101_512x512_80k.yaml")
    bb = cfg.model.backbone
    assert list(bb.layers) == [3, 4, 23, 3]
    assert int(bb.output_dim) == 512
    assert int(cfg.model.score_concat_index) == 3
    assert int(cfg.model.text_encoder.context_length) == 13
    assert int(cfg.model.context_length) == 5
    assert int(cfg.model.decode_head.num_classes) == 150
    assert int(cfg.training.iters) == 80000
    assert cfg.training.optimizer.type == "AdamW"
    model, _ = build_denseclip(cfg.model, ADE_CLASSES)
    assert model.num_classes == 150
    assert model.score_concat_index == 3


def test_rn50_preset_matches_reference_topology():
    """configs/denseclip_fpn_res50_512x512_80k.py parity: the RN50 preset
    differs from RN101 only in layer counts and the 1024-wide CLIP embed
    (reference output_dim/embed_dim/visual_dim all 1024)."""
    cfg = load_config(builtin_config_dir() / "denseclip_rn50_512x512_80k.yaml")
    bb = cfg.model.backbone
    assert list(bb.layers) == [3, 4, 6, 3]
    assert int(bb.output_dim) == 1024
    assert int(cfg.model.text_dim) == 1024
    assert int(cfg.model.text_encoder.embed_dim) == 1024
    assert int(cfg.model.score_concat_index) == 3
    assert int(cfg.model.decode_head.num_classes) == 150
    assert int(cfg.training.iters) == 80000
    model, _ = build_denseclip(cfg.model, ADE_CLASSES)
    assert model.num_classes == 150


class TestFrozenModulesFromCfg:
    def test_default_towers_frozen(self):
        from denseclip_vit_multimodal_tpu.train.state import (
            frozen_modules_from_cfg,
        )

        assert frozen_modules_from_cfg({}) == ("backbone", "text_encoder")

    def test_positive_lr_mult_unfreezes(self):
        """Heritage recipe: backbone lr x0.1 must actually TRAIN the backbone
        (reference denseclip_fpn_vit-b_640x640_80k.py:53-63) — round-1 left
        it frozen regardless of the configured multiplier."""
        from denseclip_vit_multimodal_tpu.train.state import (
            frozen_modules_from_cfg,
        )

        cfg = {"lr_mults": {"backbone": 0.1, "text_encoder": 0.0}}
        assert frozen_modules_from_cfg(cfg) == ("text_encoder",)

    def test_paramwise_schema_unfreezes_too(self):
        from denseclip_vit_multimodal_tpu.train.state import (
            frozen_modules_from_cfg,
        )

        cfg = {"paramwise": {"backbone_lr_mult": 0.1,
                             "text_encoder_lr_mult": 0.0}}
        assert frozen_modules_from_cfg(cfg) == ("text_encoder",)

    def test_zero_mult_freezes_extra_module(self):
        from denseclip_vit_multimodal_tpu.train.state import (
            frozen_modules_from_cfg,
        )

        cfg = {"lr_mults": {"neck": 0.0}}
        assert frozen_modules_from_cfg(cfg) == (
            "backbone", "neck", "text_encoder",
        )


@pytest.mark.parametrize(
    "preset", sorted(p.name for p in builtin_config_dir().glob("*.yaml"))
)
def test_preset_train_crop_divides_patch(preset):
    """Every ViT preset's TRAIN crop must divide its patch size — the
    backbone asserts it (models/vit.py:71), so a bad preset crashes
    tools/train.py at init.  (Caught live: the ViT-L/14 preset inherited
    the ViT-B 512x1024 crop.)"""
    cfg = load_config(builtin_config_dir() / preset)
    bb = cfg.model.get("backbone", {})
    if str(bb.get("type", "")) != "CLIPVisionTransformer":
        return
    patch = int(bb.get("patch_size", 16))
    ch, cw = (int(x) for x in cfg.get("data", {}).get(
        "crop_size", [512, 1024]))
    assert ch % patch == 0 and cw % patch == 0, (preset, (ch, cw), patch)
