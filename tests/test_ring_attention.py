"""Sequence-parallel ring attention on the virtual 8-device CPU mesh.

Exactness vs the single-device reference (fp32), masking via global key
positions reconstructed from the ring rotation, and gradient flow through
scan + ppermute (SURVEY.md §5.7 stretch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from denseclip_vit_multimodal_tpu.models.layers import _xla_attention
from denseclip_vit_multimodal_tpu.parallel.ring_attention import ring_attention

B, N, H, DH = 2, 256, 4, 32


@pytest.fixture(scope="module")
def sp_mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("sp",))


def _qkv(seed):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, N, H, DH)
    return (
        jax.random.normal(kq, shape, jnp.float32),
        jax.random.normal(kk, shape, jnp.float32),
        jax.random.normal(kv, shape, jnp.float32),
    )


def test_matches_single_device_attention(sp_mesh):
    q, k, v = _qkv(0)
    out = ring_attention(q, k, v, sp_mesh, axis_name="sp")
    ref = _xla_attention(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_valid_len_masking(sp_mesh):
    """Masked keys span multiple ring shards (valid 200 of 256 over 8
    shards of 32: shard 6 is partial, shard 7 fully masked)."""
    q, k, v = _qkv(1)
    valid = 200
    out = ring_attention(q, k, v, sp_mesh, axis_name="sp", valid_len=valid)
    ref = _xla_attention(q, k, v, causal=False, valid_len=valid)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_gradients_flow_through_ring(sp_mesh):
    q, k, v = _qkv(2)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, sp_mesh, axis_name="sp") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, causal=False) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name}",
        )


def test_jit_compiles_with_sharded_inputs(sp_mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v = _qkv(3)
    sharding = NamedSharding(sp_mesh, P(None, "sp"))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))
    fn = jax.jit(
        lambda a, b, c: ring_attention(a, b, c, sp_mesh, axis_name="sp")
    )
    out = fn(qs, ks, vs)
    ref = _xla_attention(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    # output stays sequence-sharded on the ring axis
    assert out.sharding.spec == P(None, "sp")


def test_indivisible_sequence_rejected(sp_mesh):
    q, k, v = _qkv(4)
    with pytest.raises(AssertionError, match="not divisible"):
        ring_attention(q[:, :250], k[:, :250], v[:, :250], sp_mesh,
                       axis_name="sp")
