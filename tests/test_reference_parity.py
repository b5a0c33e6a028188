"""Parity against the ACTUAL reference modules, imported at test time.

The strongest possible evidence: instantiate the reference's own torch
classes from /root/reference/segmentation/denseclip/models.py (runtime
import — no code is copied), transplant their weights into our Flax modules
through train/clip_import.py, and compare activations.

Also demonstrates the documented divergence (SURVEY.md §7 hard parts): the
reference `Transformer.forward` applies its block stack TWICE
(models.py:305-307), so the raw reference text tower does NOT match CLIP
semantics; with the stack applied once (as every consumer of OpenAI CLIP
does, and as its own ViT path does by iterating resblocks directly), the
reference matches our implementation exactly.

Skipped wholesale when /root/reference is not mounted.  timm/ftfy/regex are
stubbed just enough for the import (they are only exercised by code paths
these tests do not run: drop-path training mode and BPE tokenization).
"""

import os
import sys
import types

import numpy as np
import pytest

REF_PATH = "/root/reference/segmentation"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PATH), reason="reference repo not mounted"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _install_stubs():
    """Minimal fakes for the reference's unused third-party imports."""
    # Bind OUR tokenizer to its stdlib-re fallback BEFORE the regex stub
    # exists (its module-level `import regex` must keep failing).
    import denseclip_vit_multimodal_tpu.text.tokenizer  # noqa: F401
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        layers = types.ModuleType("timm.layers")

        def drop_path(x, drop_prob=0.0, training=False, scale_by_keep=True):
            assert not training, "stub only supports eval mode"
            return x

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a, b)
            return tensor

        layers.drop_path = drop_path
        layers.trunc_normal_ = trunc_normal_
        layers.drop = types.SimpleNamespace(drop_path=drop_path)
        timm.layers = layers
        models = types.ModuleType("timm.models")
        vit_mod = types.ModuleType("timm.models.vision_transformer")

        class VisionTransformer:  # referenced but never instantiated
            pass

        vit_mod.VisionTransformer = VisionTransformer
        models.vision_transformer = vit_mod
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = layers
        sys.modules["timm.models"] = models
        sys.modules["timm.models.vision_transformer"] = vit_mod
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy
    if "regex" not in sys.modules:
        try:
            import regex  # noqa: F401 — real package wins when available
        except ImportError:
            regex = types.ModuleType("regex")

            class _LazyPattern:
                def __init__(self, *a, **k):
                    pass

                def findall(self, *a, **k):  # pragma: no cover - unused
                    raise NotImplementedError("regex stub")

            regex.compile = lambda *a, **k: _LazyPattern()
            regex.IGNORECASE = 0
            sys.modules["regex"] = regex


@pytest.fixture(scope="module")
def ref_models():
    _install_stubs()
    sys.path.insert(0, REF_PATH)
    try:
        from denseclip import models as ref
    finally:
        sys.path.remove(REF_PATH)
    return ref


WIDTH, LAYERS, HEADS, PATCH, RES = 64, 3, 4, 8, 32


def test_reference_vit_forward_parity(ref_models):
    """Our ViT == the reference CLIPVisionTransformer, weights transplanted."""
    from denseclip_vit_multimodal_tpu.models.vit import CLIPVisionTransformer
    from denseclip_vit_multimodal_tpu.train.clip_import import import_vit_params

    torch.manual_seed(0)
    ref_vit = ref_models.CLIPVisionTransformer(
        input_resolution=RES, patch_size=PATCH, width=WIDTH, layers=LAYERS,
        heads=HEADS, output_dim=WIDTH, out_indices=list(range(LAYERS)),
    ).eval()
    state = {
        f"visual.{k}": v.detach().float().numpy()
        for k, v in ref_vit.state_dict().items()
    }
    # the reference hardcodes a [width, 512] CLIP projection; filter it —
    # it is unused in the dense path on both sides
    params = import_vit_params(
        state, layers=LAYERS, base_grid=RES // PATCH, clip_proj_dim=WIDTH
    )
    params.setdefault("proj", np.zeros((WIDTH, WIDTH), np.float32))

    x = np.random.RandomState(0).randn(2, 3, RES, RES).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_vit(torch.from_numpy(x))

    ours = CLIPVisionTransformer(
        patch_size=PATCH, width=WIDTH, layers=LAYERS, heads=HEADS,
        input_resolution=RES, out_indices=tuple(range(LAYERS)),
        clip_proj_dim=WIDTH,
    ).apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))

    assert len(ref_out) == len(ours) == LAYERS
    for i, (r, o) in enumerate(zip(ref_out, ours)):
        # reference emits NCHW; ours NHWC
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1),
            rtol=3e-4, atol=3e-4, err_msg=f"tap {i}",
        )


def test_reference_vit_pos_interp_parity(ref_models):
    """Pos-embed interpolation path (input size != trained grid)."""
    from denseclip_vit_multimodal_tpu.models.vit import CLIPVisionTransformer
    from denseclip_vit_multimodal_tpu.train.clip_import import import_vit_params

    torch.manual_seed(1)
    ref_vit = ref_models.CLIPVisionTransformer(
        input_resolution=RES, patch_size=PATCH, width=WIDTH, layers=2,
        heads=HEADS, output_dim=WIDTH, out_indices=[1],
    ).eval()
    state = {
        f"visual.{k}": v.detach().float().numpy()
        for k, v in ref_vit.state_dict().items()
    }
    x = np.random.RandomState(1).randn(1, 3, 48, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_vit(torch.from_numpy(x))[0]

    params = import_vit_params(
        state, layers=2, base_grid=RES // PATCH, clip_proj_dim=WIDTH
    )
    params.setdefault("proj", np.zeros((WIDTH, WIDTH), np.float32))
    ours = CLIPVisionTransformer(
        patch_size=PATCH, width=WIDTH, layers=2, heads=HEADS,
        input_resolution=RES, out_indices=(1,), clip_proj_dim=WIDTH,
    ).apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))[0]
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.numpy().transpose(0, 2, 3, 1),
        rtol=3e-4, atol=3e-4,
    )


def test_reference_text_tower_double_apply_documented(ref_models):
    """The reference Transformer double-applies its stack (models.py:305-307);
    single-pass (CLIP semantics) matches our tower exactly."""
    from denseclip_vit_multimodal_tpu.models.text import CLIPTextContextEncoder
    from denseclip_vit_multimodal_tpu.text.tokenizer import tokenize
    from denseclip_vit_multimodal_tpu.train.clip_import import import_text_params

    torch.manual_seed(2)
    total, n2, embed = 10, 4, 24
    ref_txt = ref_models.CLIPTextContextEncoder(
        context_length=total, vocab_size=49408, transformer_width=WIDTH,
        transformer_heads=HEADS, transformer_layers=2, embed_dim=embed,
    ).eval()
    # The reference never calls its init_weights (SURVEY §2.1 quirk); its
    # pos-embed/projection are torch.empty.  Give them defined values.
    with torch.no_grad():
        ref_txt.positional_embedding.normal_(0, 0.01)
        ref_txt.text_projection.normal_(0, WIDTH**-0.5)

    texts = tokenize(["road", "sky"], context_length=total - n2)
    ctx = np.random.RandomState(3).randn(2, n2, WIDTH).astype(np.float32) * 0.1

    with torch.no_grad():
        ref_double = ref_txt(
            torch.from_numpy(texts.astype(np.int64)), torch.from_numpy(ctx)
        )

    state = {k: v.detach().float().numpy() for k, v in ref_txt.state_dict().items()}
    params = import_text_params(state, layers=2, context_length=total, embed_dim=embed)
    ours = CLIPTextContextEncoder(
        context_length=total, transformer_width=WIDTH, transformer_heads=HEADS,
        transformer_layers=2, embed_dim=embed,
    ).apply({"params": params}, jnp.asarray(texts), jnp.asarray(ctx))

    # (a) raw reference output differs: the double-apply bug is real.
    assert not np.allclose(np.asarray(ours), ref_double.numpy(), atol=1e-3)

    # (b) applying the reference stack ONCE reproduces our output exactly.
    def single_pass(module, x):
        for blk in module.transformer.resblocks:
            x = blk(x)
        return x

    with torch.no_grad():
        k, n1 = texts.shape
        x_text = ref_txt.token_embedding(torch.from_numpy(texts.astype(np.int64)))
        b = ctx.shape[0]
        x_text = x_text.unsqueeze(0).expand(b, k, n1, WIDTH)
        c = torch.from_numpy(ctx).unsqueeze(1).expand(b, k, n2, WIDTH)
        seq = torch.cat([x_text[:, :, :1], c, x_text[:, :, 1:]], dim=2)
        seq = seq.reshape(b * k, total, WIDTH) + ref_txt.positional_embedding
        seq = single_pass(ref_txt, seq.permute(1, 0, 2)).permute(1, 0, 2)
        seq = ref_txt.ln_final(seq)
        eot = torch.from_numpy(texts.argmax(-1) + n2).repeat(b)
        feats = seq[torch.arange(b * k), eot] @ ref_txt.text_projection
        ref_single = feats.reshape(b, k, embed)

    np.testing.assert_allclose(
        np.asarray(ours), ref_single.numpy(), rtol=3e-4, atol=3e-4
    )
