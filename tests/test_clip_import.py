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
