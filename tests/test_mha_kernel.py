"""Custom Pallas MHA kernel: interpret-mode equivalence + VJP (CPU-safe)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denseclip_vit_multimodal_tpu.ops.mha_kernel import (
    _xla_reference,
    mha_attention,
)


def _ref(q, k, v):
    b, n, h, d = q.shape

    def to_bh(x):
        return jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)

    out = _xla_reference(to_bh(q), to_bh(k), to_bh(v), d**-0.5)
    return jnp.swapaxes(out.reshape(b, h, n, d), 1, 2)


@pytest.mark.parametrize("n", [64, 128, 200, 513])
def test_kernel_matches_reference(n):
    rng = jax.random.PRNGKey(n)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (2, n, 3, 64)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    out = mha_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v)), rtol=2e-5, atol=2e-5
    )


def test_kernel_padding_mask_exact():
    """Padded columns must not leak probability mass: N=130 pads to 256."""
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (1, 130, 2, 64)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32) + 5.0  # large keys
    v = jax.random.normal(kv, shape, jnp.float32)
    out = mha_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v)), rtol=2e-5, atol=2e-5
    )


def test_kernel_custom_vjp():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (1, 96, 2, 64)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)

    g_kernel = jax.grad(lambda q: mha_attention(q, k, v, interpret=True).sum())(q)
    g_ref = jax.grad(lambda q: _ref(q, k, v).sum())(q)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_ref), rtol=2e-4, atol=2e-5
    )


def test_kernel_bf16_inputs_close():
    """bf16 q/k/v through the kernel stay within bf16-level tolerance of
    the fp32 reference.  (The DENSECLIP_EXP_BF16 experiment branch is env-
    gated, read at import, and defaults OFF — it is a documented negative
    result and is NOT covered here.)"""
    rng = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (2, 256, 3, 64)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    out = mha_attention(
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(_ref(q, k, v)),
        rtol=5e-2, atol=3e-2,
    )


def test_qkv_kernel_bf16_inputs_close():
    from denseclip_vit_multimodal_tpu.ops.mha_kernel import (
        _qkv_ref,
        mha_qkv_attention,
    )

    qkv = jax.random.normal(jax.random.PRNGKey(9), (2, 200, 3 * 128), jnp.float32)
    out = mha_qkv_attention(qkv.astype(jnp.bfloat16), 2, interpret=True)
    ref = _qkv_ref(qkv, 2, 64**-0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=5e-2, atol=3e-2
    )


def test_qkv_kernel_pallas_backward_parity():
    """Pallas dqkv == XLA-reference VJP (fp32, incl. padding + masking)."""
    from denseclip_vit_multimodal_tpu.ops.mha_kernel import (
        _qkv_mha,
        _qkv_ref,
    )

    heads, n, hd = 2, 200, 128  # n pads to 256; head_dim 64
    qkv = jax.random.normal(jax.random.PRNGKey(11), (2, n, 3 * hd), jnp.float32)
    scale = 64**-0.5

    def loss_kernel(x):
        return jnp.sum(jnp.sin(_qkv_mha(x, heads, scale, 0, True, None)))

    def loss_ref(x):
        return jnp.sum(jnp.sin(_qkv_ref(x, heads, scale)))

    g_kernel = jax.grad(loss_kernel)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_ref), rtol=2e-4, atol=2e-5
    )


def test_qkv_kernel_backward_valid_len_masking():
    """Masked key positions must receive zero dk/dv.

    The loss reads only rows < valid_len: output rows at pad positions are
    contractually unspecified (the ViT slices them off, vit.py pad-once),
    so gradients flow only through valid rows — the real training situation.
    """
    from denseclip_vit_multimodal_tpu.ops.mha_kernel import _qkv_mha, _qkv_ref

    heads, n, hd, valid = 2, 128, 128, 100
    qkv = jax.random.normal(jax.random.PRNGKey(13), (1, n, 3 * hd), jnp.float32)
    scale = 64**-0.5

    g = jax.grad(
        lambda x: jnp.sum(
            _qkv_mha(x, heads, scale, 0, True, valid)[:, :valid] ** 2
        )
    )(qkv)
    g_ref = jax.grad(
        lambda x: jnp.sum(_qkv_ref(x, heads, scale, valid)[:, :valid] ** 2)
    )(qkv)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-5
    )
    # dk/dv beyond valid_len are exactly zero (masked columns)
    dk = np.asarray(g)[:, valid:, hd : 2 * hd]
    dv = np.asarray(g)[:, valid:, 2 * hd :]
    assert np.abs(dk).max() == 0.0
    assert np.abs(dv).max() == 0.0


def test_bhnd_kernel_backward_bf16_close():
    q = jax.random.normal(jax.random.PRNGKey(17), (1, 256, 4, 64), jnp.float32)
    g16 = jax.grad(
        lambda x: jnp.sum(
            mha_attention(
                x.astype(jnp.bfloat16),
                x.astype(jnp.bfloat16),
                x.astype(jnp.bfloat16),
                interpret=True,
            ).astype(jnp.float32)
            ** 2
        )
    )(q)
    g32 = jax.grad(
        lambda x: jnp.sum(_ref(x, x, x) ** 2)
    )(q)
    np.testing.assert_allclose(
        np.asarray(g16), np.asarray(g32), rtol=6e-2, atol=6e-2
    )


def test_pick_block_q_vmem_model():
    """Pin the q-tile search at the shapes the model serves (measured on
    v5e): slide windows (N=1601 -> pad 1664) take the 832-row tile with
    K/V charged double-buffered; whole-frame (N=8193 -> pad 8320) relaxes
    the K/V charge to single-buffered and takes 128 rows (80 with the full
    charge was 2.5% slower; 208 OOMs Mosaic's scoped VMEM).  Every pick
    must divide padded N and be a multiple of 8 sublanes."""
    from denseclip_vit_multimodal_tpu.ops.mha_kernel import _pick_block_q

    assert _pick_block_q(1664, 0) == 832
    assert _pick_block_q(1664, 0, score_bufs=3) == 416  # backward: 3 tiles
    assert _pick_block_q(8320, 0) == 128
    assert _pick_block_q(8448, 0) == 128
    for n_pad in (256, 1664, 2176, 8320, 8448):
        for bufs in (1, 3):
            bq = _pick_block_q(n_pad, 0, score_bufs=bufs)
            assert n_pad % bq == 0 and bq % 8 == 0
    # `requested` caps the search
    assert _pick_block_q(1664, 416) == 416
