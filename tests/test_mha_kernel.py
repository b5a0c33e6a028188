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
