"""ResNet backbone path: attention pooling, FPN, score-map concat.

Exercises the mmseg-heritage configuration shape
(reference configs/denseclip_fpn_res50_512x512_80k.py: score map concatenated
into the FPN input at index 3) on a tiny RN model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denseclip_vit_multimodal_tpu.core.config import load_config
from denseclip_vit_multimodal_tpu.models.denseclip import (
    CITYSCAPES_CLASSES,
    build_denseclip,
)


@pytest.fixture(scope="module")
def tiny_rn_cfg():
    return {
        "type": "DenseCLIP",
        "text_dim": 32,
        "context_length": 5,
        "token_embed_dim": 64,
        "context_feature": "attention",
        "score_concat_index": 3,
        "backbone": {
            "type": "CLIPResNetWithAttention",
            "layers": [1, 1, 1, 1],
            "width": 8,
            "output_dim": 32,
            "input_resolution": 64,
        },
        "text_encoder": {
            "type": "CLIPTextContextEncoder",
            "context_length": 13,
            "vocab_size": 49408,
            "transformer_width": 64,
            "transformer_heads": 2,
            "transformer_layers": 2,
            "embed_dim": 32,
        },
        "context_decoder": {
            "type": "ContextDecoder",
            "transformer_width": 32,
            "transformer_heads": 2,
            "transformer_layers": 1,
            "dropout": 0.1,
        },
        "neck": {"type": "FPN", "in_channels": [32, 64, 128, 256], "out_channels": 32,
                 "num_outs": 4},
        "decode_head": {"type": "FPNHead", "in_channels": 32, "channels": 32,
                        "num_classes": 19},
    }


def test_rn_attention_forward_with_score_concat(tiny_rn_cfg):
    model, texts = build_denseclip(tiny_rn_cfg, CITYSCAPES_CLASSES)
    img = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(texts))
    out = model.apply(variables, jnp.asarray(img), jnp.asarray(texts),
                      return_features=True)
    assert out["seg"].shape == (2, 64, 64, 19)
    # score map computed over the attention-pooled map (stride 32)
    assert out["score_map"].shape == (2, 2, 2, 19)
    # gamma fusion parameter exists because a context decoder is configured
    assert "gamma" in variables["params"]


def test_rn_plain_backbone():
    from denseclip_vit_multimodal_tpu.models.resnet import CLIPResNet

    model = CLIPResNet(layers=(1, 1, 1, 1), width=8)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 128), (1, 2, 2, 256)
    ]


def test_rn_train_step_with_lr_mults(tiny_rn_cfg):
    """Heritage recipe: RN backbone trains with backbone lr x0.1 + frozen text
    (configs/denseclip_fpn_vit-b_640x640_80k.py:53-63 semantics)."""
    import jax
    import jax.numpy as jnp

    from denseclip_vit_multimodal_tpu.data.augment import AugmentConfig
    from denseclip_vit_multimodal_tpu.train.state import create_train_state
    from denseclip_vit_multimodal_tpu.train.step import make_train_step

    model, texts = build_denseclip(tiny_rn_cfg, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.asarray(texts),
    )
    tcfg = {
        "epochs": 1,
        "optimizer": {"lr": 1e-3},
        "scheduler": {"type": "PolyWarmup", "warmup_steps": 2,
                      "total_steps": 10},
        "lr_mults": {"backbone": 0.1},
    }
    # heritage recipe: only the text tower frozen, backbone trains at lr x0.1
    state = create_train_state(model, variables, tcfg, steps_per_epoch=5,
                               frozen_modules=("text_encoder",))
    aug = AugmentConfig(crop_size=(64, 64), scale_range=(0.75, 1.25))
    step = make_train_step(texts, aug, frozen_modules=("text_encoder",))
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (2, 96, 96, 3)).astype(np.uint8)),
        "seg": jnp.asarray(rng.randint(0, 19, (2, 96, 96)).astype(np.uint8)),
    }
    before_bb = np.asarray(
        jax.tree.leaves(state.params["backbone"])[0]
    ).copy()
    before_te = jax.tree.map(np.asarray, state.params["text_encoder"])
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_total"]))
    # text tower frozen, backbone moved
    same_te = jax.tree.map(
        np.array_equal, before_te, jax.tree.map(np.asarray,
                                                new_state.params["text_encoder"])
    )
    assert all(jax.tree.leaves(same_te))
    after_bb = np.asarray(jax.tree.leaves(new_state.params["backbone"])[0])
    assert not np.array_equal(before_bb, after_bb)
