"""CLIP importer parity: torch mini-CLIP activations vs imported Flax params.

Builds a small torch model with OpenAI CLIP's exact architecture/state-dict
layout (patch conv, class token, pre-LN blocks on nn.MultiheadAttention,
QuickGELU MLP, ln_post; text tower with causal mask + EOT pooling), imports
its weights through train/clip_import.py, and checks our modules reproduce
the torch activations within fp32 tolerance.

This is the numerics-vs-reference harness from SURVEY.md §7 step 3: the
torch fixture computes the *single-pass* transformer (CLIP semantics; the
reference's double-apply bug at models.py:305-307 is intentionally not
reproduced — the ViT path iterates blocks directly and is unaffected).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from denseclip_vit_multimodal_tpu.models.text import (  # noqa: E402
    CLIPTextContextEncoder,
    CLIPTextEncoder,
)
from denseclip_vit_multimodal_tpu.models.vit import CLIPVisionTransformer  # noqa: E402
from denseclip_vit_multimodal_tpu.text.tokenizer import tokenize  # noqa: E402
from denseclip_vit_multimodal_tpu.train.clip_import import (  # noqa: E402
    import_text_params,
    import_vit_params,
    load_clip_state_dict,
)

WIDTH, LAYERS, HEADS, PATCH = 64, 3, 4, 8
RES = 32  # base grid 4x4
TWIDTH, TLAYERS, THEADS, TCTX, TEMBED = 48, 2, 4, 77, 24


class TorchBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, heads)
        self.ln_1 = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(d, d * 4))
        self.mlp.add_module("gelu", tnn.Identity())
        self.mlp.add_module("c_proj", tnn.Linear(d * 4, d))
        self.ln_2 = tnn.LayerNorm(d)

    def forward(self, x, attn_mask=None):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)
        x = x + y
        y = self.ln_2(x)
        y = self.mlp.c_fc(y)
        y = y * torch.sigmoid(1.702 * y)  # QuickGELU
        y = self.mlp.c_proj(y)
        return x + y


class TorchVisual(tnn.Module):
    """state-dict layout identical to OpenAI CLIP's `visual.` subtree."""

    def __init__(self):
        super().__init__()
        grid = RES // PATCH
        self.conv1 = tnn.Conv2d(3, WIDTH, PATCH, PATCH, bias=False)
        self.class_embedding = tnn.Parameter(torch.randn(WIDTH) * 0.02)
        self.positional_embedding = tnn.Parameter(
            torch.randn(grid * grid + 1, WIDTH) * 0.02
        )
        self.ln_pre = tnn.LayerNorm(WIDTH)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [TorchBlock(WIDTH, HEADS) for _ in range(LAYERS)]
        )
        self.ln_post = tnn.LayerNorm(WIDTH)
        self.proj = tnn.Parameter(torch.randn(WIDTH, 16) * 0.02)

    def forward_taps(self, x):
        b = x.shape[0]
        x = self.conv1(x)
        h, w = x.shape[-2:]
        x = x.flatten(2).transpose(1, 2)
        cls = self.class_embedding.expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)
        taps = []
        for blk in self.transformer.resblocks:
            x = blk(x)
            taps.append(x.permute(1, 0, 2))
        taps[-1] = self.ln_post(taps[-1])
        return [t[:, 1:, :].reshape(b, h, w, WIDTH) for t in taps]


class TorchText(tnn.Module):
    def __init__(self):
        super().__init__()
        self.token_embedding = tnn.Embedding(49408, TWIDTH)
        self.positional_embedding = tnn.Parameter(torch.randn(TCTX, TWIDTH) * 0.01)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [TorchBlock(TWIDTH, THEADS) for _ in range(TLAYERS)]
        )
        self.ln_final = tnn.LayerNorm(TWIDTH)
        self.text_projection = tnn.Parameter(torch.randn(TWIDTH, TEMBED) * 0.02)

    def causal_mask(self, n):
        mask = torch.full((n, n), float("-inf"))
        return mask.triu_(1)

    def forward(self, text):
        x = self.token_embedding(text)
        n = x.shape[1]
        x = x + self.positional_embedding[:n]
        x = x.permute(1, 0, 2)
        mask = self.causal_mask(n)
        for blk in self.transformer.resblocks:
            x = blk(x, attn_mask=mask)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        eot = x[torch.arange(x.shape[0]), text.argmax(dim=-1)]
        return eot @ self.text_projection

    def forward_context(self, text, context):
        """Reference CLIPTextContextEncoder splice (models.py:844-864)."""
        x_text = self.token_embedding(text)  # [K, N1, C]
        k, n1, c = x_text.shape
        b, n2, _ = context.shape
        eos = (text.argmax(dim=-1) + n2).reshape(1, k).expand(b, k).reshape(-1)
        x_text = x_text.reshape(1, k, n1, c).expand(b, k, n1, c)
        ctx = context.reshape(b, 1, n2, c).expand(b, k, n2, c)
        x = torch.cat([x_text[:, :, :1], ctx, x_text[:, :, 1:]], dim=2)
        x = x.reshape(b * k, n1 + n2, c) + self.positional_embedding[: n1 + n2]
        x = x.permute(1, 0, 2)
        mask = self.causal_mask(n1 + n2)
        for blk in self.transformer.resblocks:
            x = blk(x, attn_mask=mask)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        eot = x[torch.arange(x.shape[0]), eos]
        return (eot @ self.text_projection).reshape(b, k, TEMBED)


def _prefixed_state(module, prefix):
    return {f"{prefix}{k}": v.detach().float().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def torch_visual():
    torch.manual_seed(0)
    m = TorchVisual().eval()
    return m


@pytest.fixture(scope="module")
def torch_text():
    torch.manual_seed(1)
    m = TorchText().eval()
    return m


def test_vit_activation_parity(torch_visual):
    state = _prefixed_state(torch_visual, "visual.")
    params = import_vit_params(state, layers=LAYERS, base_grid=RES // PATCH)

    x = np.random.RandomState(0).randn(2, 3, RES, RES).astype(np.float32)
    with torch.no_grad():
        ref_taps = torch_visual.forward_taps(torch.from_numpy(x))

    vit = CLIPVisionTransformer(
        patch_size=PATCH, width=WIDTH, layers=LAYERS, heads=HEADS,
        input_resolution=RES, out_indices=tuple(range(LAYERS)), clip_proj_dim=16,
    )
    ours = vit.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(ours) == LAYERS
    for i, (a, b) in enumerate(zip(ours, ref_taps)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"layer {i}",
        )


def test_vit_pos_embed_resize_on_import(torch_visual):
    """Importing into a larger base grid resizes the pos embed."""
    state = _prefixed_state(torch_visual, "visual.")
    params = import_vit_params(state, layers=LAYERS, base_grid=8)
    assert params["positional_embedding"].shape == (65, WIDTH)
    np.testing.assert_allclose(
        params["positional_embedding"][0],
        state["visual.positional_embedding"][0],
    )


def test_text_encoder_parity(torch_text):
    state = _prefixed_state(torch_text, "")
    texts_np = tokenize(["road", "traffic light", "sky"], context_length=12)
    params = import_text_params(
        state, layers=TLAYERS, context_length=12, embed_dim=TEMBED
    )
    with torch.no_grad():
        ref = torch_text.forward(torch.from_numpy(texts_np.astype(np.int64)))

    enc = CLIPTextEncoder(
        context_length=12, transformer_width=TWIDTH, transformer_heads=THEADS,
        transformer_layers=TLAYERS, embed_dim=TEMBED,
    )
    ours = enc.apply({"params": params}, jnp.asarray(texts_np))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_context_encoder_parity(torch_text):
    state = _prefixed_state(torch_text, "")
    texts_np = tokenize(["road", "sky"], context_length=6)
    n2 = 4
    total = 10
    params = import_text_params(
        state, layers=TLAYERS, context_length=total, embed_dim=TEMBED
    )
    ctx = np.random.RandomState(1).randn(2, n2, TWIDTH).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = torch_text.forward_context(
            torch.from_numpy(texts_np.astype(np.int64)), torch.from_numpy(ctx)
        )

    enc = CLIPTextContextEncoder(
        context_length=total, transformer_width=TWIDTH,
        transformer_heads=THEADS, transformer_layers=TLAYERS, embed_dim=TEMBED,
    )
    ours = enc.apply({"params": params}, jnp.asarray(texts_np), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_text_pos_embed_truncation(torch_text):
    state = _prefixed_state(torch_text, "")
    params = import_text_params(state, layers=TLAYERS, context_length=22, embed_dim=TEMBED)
    assert params["positional_embedding"].shape == (22, TWIDTH)
    np.testing.assert_allclose(
        params["positional_embedding"], state["positional_embedding"][:22]
    )


# --- real checkpoint-file ingestion (torch.jit archive + pickle fallback) ---
#
# The reference's cold start is `torch.jit.load("ViT-B-16.pt")`
# (reference denseclip.py:156-191); every other test in this suite feeds the
# importer runtime-built state_dicts.  Here an actual JIT archive round-trips
# through `load_clip_state_dict` unmocked, flows into the full composite via
# `load_clip_into_variables`, and the loaded model runs forward.


class _JitAttn(tnn.Module):
    """nn.MultiheadAttention's state-dict layout without its (unscriptable-
    for-save) forward: in_proj_weight/bias + out_proj."""

    def __init__(self, d):
        super().__init__()
        self.in_proj_weight = tnn.Parameter(torch.randn(3 * d, d) * 0.02)
        self.in_proj_bias = tnn.Parameter(torch.randn(3 * d) * 0.02)
        self.out_proj = tnn.Linear(d, d)


class _JitBlock(tnn.Module):
    def __init__(self, d):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(d)
        self.ln_2 = tnn.LayerNorm(d)
        self.attn = _JitAttn(d)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(d, d * 4))
        self.mlp.add_module("c_proj", tnn.Linear(d * 4, d))


class _JitTower(tnn.Module):
    def __init__(self, d, layers):
        super().__init__()
        self.resblocks = tnn.ModuleList([_JitBlock(d) for _ in range(layers)])


class TorchCLIPRoot(tnn.Module):
    """Minimal module with OpenAI CLIP's exact state-dict layout: `visual.*`
    tower + text-tower keys at the root (no prefix).  Weights are random —
    the JIT tests check file-format ingestion and leaf placement, not
    activation parity (the tests above pin that)."""

    def __init__(self):
        super().__init__()
        grid = RES // PATCH
        self.visual = tnn.Module()
        self.visual.conv1 = tnn.Conv2d(3, WIDTH, PATCH, PATCH, bias=False)
        self.visual.class_embedding = tnn.Parameter(torch.randn(WIDTH) * 0.02)
        self.visual.positional_embedding = tnn.Parameter(
            torch.randn(grid * grid + 1, WIDTH) * 0.02
        )
        self.visual.ln_pre = tnn.LayerNorm(WIDTH)
        self.visual.ln_post = tnn.LayerNorm(WIDTH)
        self.visual.proj = tnn.Parameter(torch.randn(WIDTH, 512) * 0.02)
        self.visual.transformer = _JitTower(WIDTH, LAYERS)

        self.transformer = _JitTower(TWIDTH, TLAYERS)
        self.token_embedding = tnn.Embedding(49408, TWIDTH)
        self.positional_embedding = tnn.Parameter(
            torch.randn(77, TWIDTH) * 0.01
        )
        self.ln_final = tnn.LayerNorm(TWIDTH)
        self.text_projection = tnn.Parameter(torch.randn(TWIDTH, TEMBED) * 0.02)

    def forward(self):
        return self.text_projection


JIT_MODEL_CFG = {
    "type": "DenseCLIP",
    "text_dim": TEMBED,
    "context_length": 5,
    "token_embed_dim": TWIDTH,
    "context_feature": "attention",
    "score_concat_index": -1,
    "tau": 0.05,
    "backbone": {
        "type": "CLIPVisionTransformer",
        "patch_size": PATCH,
        "width": WIDTH,
        "layers": LAYERS,
        "heads": HEADS,
        "input_resolution": RES,
        "output_dim": WIDTH,
        "out_indices": [0, 1, 2],
    },
    "text_encoder": {
        "type": "CLIPTextContextEncoder",
        "context_length": 13,
        "vocab_size": 49408,
        "transformer_width": TWIDTH,
        "transformer_heads": THEADS,
        "transformer_layers": TLAYERS,
        "embed_dim": TEMBED,
    },
    "neck": {"type": "ViTFeatureFusionNeck", "inter_channels": 16,
             "out_channels": 32},
    "decode_head": {"type": "FPNHead", "in_channels": 32, "channels": 32,
                    "num_classes": 19, "align_corners": False},
    "depth_head": {"type": "FCNHeadDepth", "in_channels": 32, "channels": 16},
}


@pytest.fixture(scope="module")
def jit_archive(tmp_path_factory):
    torch.manual_seed(3)
    root = TorchCLIPRoot().eval()
    path = str(tmp_path_factory.mktemp("clip") / "stub_clip_vit.pt")
    torch.jit.save(torch.jit.script(root), path)
    return path, root


def test_load_clip_state_dict_reads_jit_archive(jit_archive):
    path, root = jit_archive
    state = load_clip_state_dict(path)
    assert "visual.conv1.weight" in state
    assert "visual.transformer.resblocks.0.attn.in_proj_weight" in state
    assert "token_embedding.weight" in state
    np.testing.assert_allclose(
        state["text_projection"], root.text_projection.detach().numpy()
    )
    np.testing.assert_allclose(
        state["visual.ln_post.weight"],
        root.visual.ln_post.weight.detach().numpy(),
    )


def test_load_clip_state_dict_pickle_fallback(jit_archive, tmp_path):
    """A plain torch.save(state_dict) checkpoint reads identically through
    the non-JIT fallback branch."""
    path, root = jit_archive
    pkl = str(tmp_path / "stub_clip_plain.pt")
    torch.save(root.state_dict(), pkl)
    via_jit = load_clip_state_dict(path)
    via_pickle = load_clip_state_dict(pkl)
    assert sorted(via_jit) == sorted(via_pickle)
    for k in via_jit:
        np.testing.assert_allclose(via_jit[k], via_pickle[k], err_msg=k)


def test_jit_archive_through_full_composite(jit_archive):
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        CITYSCAPES_CLASSES,
        build_denseclip,
    )
    from denseclip_vit_multimodal_tpu.train.clip_import import (
        load_clip_into_variables,
    )

    path, root = jit_archive
    model, texts = build_denseclip(JIT_MODEL_CFG, CITYSCAPES_CLASSES)
    img = jnp.zeros((1, 32, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, jnp.asarray(texts))
    loaded, n_vis, n_txt = load_clip_into_variables(
        variables, path, JIT_MODEL_CFG
    )
    assert n_vis > 10 and n_txt > 10, (n_vis, n_txt)

    params = loaded["params"]
    np.testing.assert_allclose(
        params["backbone"]["ln_post"]["scale"],
        root.visual.ln_post.weight.detach().numpy(),
    )
    # per-layer torch in_proj [3D, D] -> stacked scan-layout qkv [L, D, 3D]
    qkv = params["backbone"]["transformer"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert qkv.shape == (LAYERS, WIDTH, 3 * WIDTH)
    np.testing.assert_allclose(
        qkv[1],
        root.visual.transformer.resblocks[1].attn.in_proj_weight.detach().numpy().T,
    )
    # text pos-embed truncated 77 -> model capacity 13
    assert params["text_encoder"]["positional_embedding"].shape == (13, TWIDTH)
    np.testing.assert_allclose(
        params["text_encoder"]["positional_embedding"],
        root.positional_embedding.detach().numpy()[:13],
    )

    out = model.apply(loaded, img, jnp.asarray(texts))
    assert out["seg"].shape == (1, 32, 64, 19)
    assert bool(jnp.isfinite(out["seg"]).all())
    assert bool(jnp.isfinite(out["depth"]).all())
