"""Fused LN+QKV+attention kernel: interpret-mode parity + integration.

The op fuses the pre-LN ViT block's `attn(LN(x))` prologue
(reference: segmentation/denseclip/models.py:271-294 semantics).  It is
opt-in (DENSECLIP_FUSED_LNQKV=1) — measured slower than the unfused path on
v5e — but must stay exact and importable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denseclip_vit_multimodal_tpu.ops.lnqkv_kernel import (
    _lnqkv_reference,
    ln_qkv_attention,
    lnqkv_supported,
)

B, N, D, H = 2, 300, 128, 2
SCALE = 64**-0.5


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.randn(B, N, D).astype(np.float32)),
        jnp.asarray(rng.rand(D).astype(np.float32) + 0.5),
        jnp.asarray(rng.randn(D).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(D, 3 * D).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(3 * D).astype(np.float32) * 0.01),
    )


def test_forward_parity(inputs):
    x, gamma, beta, w, b = inputs
    out = ln_qkv_attention(x, gamma, beta, w, b, H, interpret=True)
    ref = _lnqkv_reference(x, gamma, beta, w, b, H, SCALE, 1e-5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_forward_parity_valid_len(inputs):
    x, gamma, beta, w, b = inputs
    valid = 250
    out = ln_qkv_attention(x, gamma, beta, w, b, H, interpret=True,
                           valid_len=valid)
    ref = _lnqkv_reference(x, gamma, beta, w, b, H, SCALE, 1e-5,
                           valid_len=valid)
    np.testing.assert_allclose(
        np.asarray(out)[:, :valid], np.asarray(ref)[:, :valid],
        rtol=2e-5, atol=2e-5,
    )


def test_grad_parity(inputs):
    x, gamma, beta, w, b = inputs
    g1 = jax.grad(
        lambda xx: jnp.sum(
            ln_qkv_attention(xx, gamma, beta, w, b, H, interpret=True) ** 2
        )
    )(x)
    g2 = jax.grad(
        lambda xx: jnp.sum(
            _lnqkv_reference(xx, gamma, beta, w, b, H, SCALE, 1e-5) ** 2
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-5
    )


def test_supported_shapes():
    assert lnqkv_supported(12, 768)
    assert lnqkv_supported(6, 768)  # head_dim 128
    assert not lnqkv_supported(8, 768)  # head_dim 96
    assert not lnqkv_supported(3, 192)  # model dim not lane-aligned


def test_block_integration_opt_in(inputs, monkeypatch):
    """With the flag on, the block's FUSED path must agree with the default
    path.  The gate requires a TPU backend, so _on_tpu is mocked and the
    kernel forced into interpret mode — and the test asserts the fused
    branch actually executed (an earlier version compared the default path
    to itself on CPU, which could never fail)."""
    from denseclip_vit_multimodal_tpu.models.layers import (
        ResidualAttentionBlock,
    )
    from denseclip_vit_multimodal_tpu.ops import attention as attn_mod
    from denseclip_vit_multimodal_tpu.ops import lnqkv_kernel as lnqkv_mod

    x = inputs[0]
    # attn_impl="flash" sidesteps the auto-dispatch N >= _FLASH_MIN_SEQ gate
    blk = ResidualAttentionBlock(num_heads=H, attn_impl="flash")
    variables = blk.init(jax.random.PRNGKey(0), x)
    base = blk.apply(variables, x)

    monkeypatch.setenv("DENSECLIP_FUSED_LNQKV", "1")
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    hit = {}
    orig = lnqkv_mod.ln_qkv_attention

    def forced_interpret(*a, **k):
        hit["fused"] = True
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(lnqkv_mod, "ln_qkv_attention", forced_interpret)
    fused = blk.apply(variables, x)
    assert hit.get("fused"), "fused LNQKV branch never executed"
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(base, np.float32),
        rtol=2e-3, atol=2e-3,
    )
