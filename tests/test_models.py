"""Module shape contracts + composite forward behavior (CPU, tiny dims)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseclip_vit_multimodal_tpu.models.context_decoder import ContextDecoder
from denseclip_vit_multimodal_tpu.models.denseclip import (
    CITYSCAPES_CLASSES,
    build_denseclip,
)
from denseclip_vit_multimodal_tpu.models.heads import FCNHead
from denseclip_vit_multimodal_tpu.models.necks import FPN, ViTFeatureFusionNeck
from denseclip_vit_multimodal_tpu.models.text import (
    CLIPTextContextEncoder,
    CLIPTextEncoder,
)
from denseclip_vit_multimodal_tpu.models.vit import (
    CLIPVisionTransformer,
    interpolate_pos_embed,
)
from denseclip_vit_multimodal_tpu.text.tokenizer import tokenize

KEY = jax.random.PRNGKey(0)


def test_vit_out_indices_shapes():
    vit = CLIPVisionTransformer(
        patch_size=16, width=96, layers=4, heads=3, out_indices=(0, 2, 3)
    )
    x = jnp.zeros((2, 64, 96, 3))
    variables = vit.init(KEY, x)
    feats = vit.apply(variables, x)
    assert len(feats) == 3
    for f in feats:
        assert f.shape == (2, 4, 6, 96)


def test_vit_pos_embed_interpolation_identity():
    pe = jnp.arange(5 * 5 * 8 + 8, dtype=jnp.float32).reshape(26, 8)
    out = interpolate_pos_embed(pe, 5, (5, 5))
    np.testing.assert_array_equal(out, pe)
    out2 = interpolate_pos_embed(pe, 5, (7, 3))
    assert out2.shape == (22, 8)
    np.testing.assert_array_equal(out2[0], pe[0])  # CLS passes through


def test_text_encoder_shapes():
    enc = CLIPTextEncoder(
        context_length=6, transformer_layers=2, transformer_width=64,
        transformer_heads=2, embed_dim=32,
    )
    texts = jnp.asarray(tokenize(["road", "sky"], 6))
    variables = enc.init(KEY, texts)
    out = enc.apply(variables, texts)
    assert out.shape == (2, 32)


def test_context_encoder_eot_shift():
    """The EOT gather must target argmax(text)+N2 after context splicing."""
    enc = CLIPTextContextEncoder(
        context_length=10, transformer_layers=1, transformer_width=64,
        transformer_heads=2, embed_dim=16,
    )
    texts = jnp.asarray(tokenize(["road", "traffic light"], 6))
    ctx = jnp.ones((3, 4, 64))
    variables = enc.init(KEY, texts, ctx)
    out = enc.apply(variables, texts, ctx)
    assert out.shape == (3, 2, 16)
    # Batch rows see identical context => identical embeddings per class.
    np.testing.assert_allclose(out[0], out[1], rtol=1e-5)


def test_context_encoder_context_sensitivity():
    enc = CLIPTextContextEncoder(
        context_length=10, transformer_layers=1, transformer_width=64,
        transformer_heads=2, embed_dim=16,
    )
    texts = jnp.asarray(tokenize(["road"], 6))
    ctx_a = jnp.zeros((1, 4, 64))
    ctx_b = jnp.ones((1, 4, 64))
    variables = enc.init(KEY, texts, ctx_a)
    out_a = enc.apply(variables, texts, ctx_a)
    out_b = enc.apply(variables, texts, ctx_b)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_context_decoder_shapes():
    dec = ContextDecoder(
        transformer_width=32, transformer_heads=2, transformer_layers=2,
        visual_dim=48, dropout=0.0,
    )
    text = jnp.ones((2, 5, 48))
    visual = jnp.ones((2, 17, 48))
    variables = dec.init(KEY, text, visual)
    out = dec.apply(variables, text, visual)
    assert out.shape == (2, 5, 48)


def test_fusion_neck_shapes():
    neck = ViTFeatureFusionNeck(num_inputs=3, out_channels=24, inter_channels=8)
    feats = [jnp.ones((2, 4, 6, 16))] * 3
    variables = neck.init(KEY, feats)
    out = neck.apply(variables, feats)
    assert out.shape == (2, 4, 6, 24)


def test_fpn_shapes():
    fpn = FPN(num_inputs=3, out_channels=16)
    feats = [
        jnp.ones((2, 16, 16, 8)),
        jnp.ones((2, 8, 8, 12)),
        jnp.ones((2, 4, 4, 20)),
    ]
    variables = fpn.init(KEY, feats)
    outs = fpn.apply(variables, feats)
    assert len(outs) == 3
    assert outs[0].shape == (2, 16, 16, 16)
    assert outs[2].shape == (2, 4, 4, 16)


def test_fcn_head_chain():
    """in -> in//4 -> channels -> num_outputs (the appended-classifier quirk,
    reference denseclip.py:305-309)."""
    head = FCNHead(in_channels=64, channels=32, num_outputs=19)
    x = jnp.ones((2, 4, 4, 64))
    variables = head.init(KEY, x)
    out = head.apply(variables, x)
    assert out.shape == (2, 4, 4, 19)
    p = variables["params"]
    assert p["conv0"]["kernel"].shape == (3, 3, 64, 16)
    assert p["conv1"]["kernel"].shape == (1, 1, 16, 32)
    assert p["classifier"]["kernel"].shape == (1, 1, 32, 19)


class TestComposite:
    @pytest.fixture(scope="class")
    def built(self, request):
        cfg = request.getfixturevalue("tiny_model_cfg")
        model, texts = build_denseclip(cfg, CITYSCAPES_CLASSES)
        img = jnp.zeros((2, 64, 128, 3))
        variables = model.init(KEY, img, jnp.asarray(texts))
        return model, texts, variables

    def test_inference_shapes(self, built):
        model, texts, variables = built
        img = jnp.zeros((2, 64, 128, 3))
        out = model.apply(variables, img, jnp.asarray(texts))
        assert out["seg"].shape == (2, 64, 128, 19)
        assert out["depth"].shape == (2, 64, 128, 1)

    def test_train_resizes_to_gt(self, built):
        model, texts, variables = built
        img = jnp.zeros((2, 64, 128, 3))
        out, _ = model.apply(
            variables,
            img,
            jnp.asarray(texts),
            train=True,
            gt_hw=(32, 64),
            mutable=["batch_stats"],
            rngs={"dropout": KEY},
        )
        assert out["seg"].shape == (2, 32, 64, 19)
        assert out["depth"].shape == (2, 32, 64, 1)

    def test_score_map_range(self, built):
        model, texts, variables = built
        img = jax.random.normal(KEY, (1, 64, 128, 3))
        out = model.apply(
            variables, img, jnp.asarray(texts), return_features=True
        )
        smap = np.asarray(out["score_map"])
        assert smap.shape == (1, 4, 8, 19)
        assert np.all(smap <= 1.0 + 1e-5) and np.all(smap >= -1.0 - 1e-5)

    def test_prompt_params_exist(self, built):
        _, _, variables = built
        p = variables["params"]
        assert p["contexts"].shape == (1, 16, 512)
        # gamma only materializes alongside a context decoder (tiny cfg has none)
        assert "gamma" not in p

    def test_deterministic_forward(self, built):
        model, texts, variables = built
        img = jax.random.normal(KEY, (1, 64, 128, 3))
        a = model.apply(variables, img, jnp.asarray(texts))
        b = model.apply(variables, img, jnp.asarray(texts))
        np.testing.assert_array_equal(np.asarray(a["seg"]), np.asarray(b["seg"]))


def test_vit_pad_once_equals_unpadded():
    """Pad-once sequence alignment + masked attention must not change outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from denseclip_vit_multimodal_tpu.models.vit import CLIPVisionTransformer

    kw = dict(patch_size=8, width=64, layers=2, heads=2,
              input_resolution=64, out_indices=(0, 1), clip_proj_dim=16)
    vit_pad = CLIPVisionTransformer(pad_sequence_to_lanes=True, **kw)
    vit_raw = CLIPVisionTransformer(pad_sequence_to_lanes=False, **kw)
    # grid 36x36 -> N=1297: >=1024 and not a lane multiple -> pad path engages
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 288, 288, 3), jnp.float32)
    params = vit_raw.init(jax.random.PRNGKey(1), x)
    out_pad = vit_pad.apply(params, x)
    out_raw = vit_raw.apply(params, x)
    for a, b in zip(out_pad, out_raw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_score_map_matches_naive_normalize():
    """Fused score map == normalize-both-then-einsum (reference
    denseclip.py:670-676 math)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from denseclip_vit_multimodal_tpu.ops.score_map import score_map

    kv, kt = jax.random.split(jax.random.PRNGKey(0))
    vis = jax.random.normal(kv, (2, 5, 7, 32), jnp.float32)
    txt = jax.random.normal(kt, (2, 19, 32), jnp.float32)
    fused = score_map(vis, txt)
    vn = vis / jnp.linalg.norm(vis, axis=-1, keepdims=True)
    tn = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    naive = jnp.einsum("bhwc,bkc->bhwk", vn, tn)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive), atol=2e-6)
    assert float(jnp.max(jnp.abs(fused))) <= 1.0 + 1e-5


def test_fpn_topdown_nearest_matches_torch_convention_on_odd_dims():
    """The top-down upsample must use torch's floor-convention nearest
    (src = floor(dst * src/dst)), which differs from half-pixel nearest
    whenever stage sizes are not exact multiples (e.g. odd dims)."""
    import torch

    fpn = FPN(num_inputs=2, out_channels=4)
    feats = [jnp.ones((1, 5, 7, 4)), jnp.ones((1, 3, 3, 4))]
    variables = fpn.init(KEY, feats)

    # Isolate the upsample: make lateral_1 pass coarse features through
    # unchanged (identity 1x1) and lateral_0 zero, then read the finest
    # level before the smoothing conv by making output_0 identity too.
    p = jax.tree.map(np.asarray, variables["params"])
    eye = np.zeros_like(p["lateral_1"]["kernel"])
    eye[0, 0] = np.eye(4)
    p["lateral_1"]["kernel"] = eye
    p["lateral_1"]["bias"] = np.zeros_like(p["lateral_1"]["bias"])
    p["lateral_0"]["kernel"] = np.zeros_like(p["lateral_0"]["kernel"])
    p["lateral_0"]["bias"] = np.zeros_like(p["lateral_0"]["bias"])
    out_eye = np.zeros_like(p["output_0"]["kernel"])  # [3,3,4,4]
    out_eye[1, 1] = np.eye(4)
    p["output_0"]["kernel"] = out_eye
    p["output_0"]["bias"] = np.zeros_like(p["output_0"]["bias"])

    rng = np.random.RandomState(0)
    coarse = rng.rand(1, 3, 3, 4).astype(np.float32)
    feats = [jnp.zeros((1, 5, 7, 4)), jnp.asarray(coarse)]
    outs = fpn.apply({"params": jax.tree.map(jnp.asarray, p)}, feats)
    ours = np.asarray(outs[0])

    ref = torch.nn.functional.interpolate(
        torch.from_numpy(coarse).permute(0, 3, 1, 2), size=(5, 7),
        mode="nearest",
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_remat_modes_gradient_equality():
    """Every `tpu.remat` mode must change memory/time only — gradients are
    bit-comparable to the no-remat baseline (selective policies save a
    subset of residuals and recompute the rest; see
    models/layers.py::resolve_remat_policy)."""
    from denseclip_vit_multimodal_tpu.models.layers import (
        Transformer,
        resolve_remat_policy,
    )

    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 17, 32).astype(np.float32)
    )

    def grads_for(remat):
        model = Transformer(width=32, layers=2, heads=2, remat=remat)
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss(v):
            final, taps = model.apply(v, x)
            return jnp.sum(final**2) + jnp.sum(taps[0] ** 2)

        return variables, jax.grad(loss)(variables)

    base_vars, base = grads_for(False)
    for mode in (True, "full", "attn", "attn_qkv", "dots"):
        v, g = grads_for(mode)
        # same init -> same params; remat must not perturb grads
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
            ),
            base,
            g,
        )

    with pytest.raises(ValueError, match="Unsupported remat mode"):
        resolve_remat_policy("bogus")
