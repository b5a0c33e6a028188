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


# --- wired model dispatch: `attn_impl: ring` is reachable from a config ---


def test_attention_core_ring_dispatch_matches_xla(sp_mesh):
    """attention_core(impl='ring') pads an indivisible sequence, rides the
    pinned ring mesh, and agrees with the exact single-device path."""
    from denseclip_vit_multimodal_tpu.models.layers import attention_core
    from denseclip_vit_multimodal_tpu.parallel.ring_attention import ring_mesh

    q, k, v = _qkv(5)
    q, k, v = q[:, :250], k[:, :250], v[:, :250]  # 250 % 8 != 0 -> pad path
    with ring_mesh(sp_mesh, "sp"):
        out = attention_core(q, k, v, impl="ring")
    ref = _xla_attention(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_attention_core_ring_auto_mesh(sp_mesh):
    """Without a pinned mesh the dispatch builds a ring over all devices."""
    from denseclip_vit_multimodal_tpu.models.layers import attention_core

    q, k, v = _qkv(6)
    out = attention_core(q, k, v, impl="ring")
    ref = _xla_attention(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_ring_falls_back_for_cross_and_causal(sp_mesh):
    """Cross-attention (m != n) and causal shapes fall back to the exact
    impls instead of erroring."""
    from denseclip_vit_multimodal_tpu.models.layers import attention_core

    q, k, v = _qkv(7)
    out = attention_core(q[:, :64], k, v, impl="ring")  # cross: 64 vs 256
    ref = _xla_attention(q[:, :64], k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    out_c = attention_core(q, k, v, impl="ring", causal=True)
    ref_c = _xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(ref_c), rtol=2e-5, atol=2e-5
    )


def test_vit_backbone_ring_matches_xla(sp_mesh):
    """Full CLIPVisionTransformer with attn_impl='ring' (the `tpu.attn_impl:
    ring` config path, build_denseclip -> backbone) reproduces the XLA
    backbone: 33-token sequence padded to the 8-ring, all taps equal."""
    from denseclip_vit_multimodal_tpu.models.vit import CLIPVisionTransformer
    from denseclip_vit_multimodal_tpu.parallel.ring_attention import ring_mesh

    kwargs = dict(patch_size=8, width=64, layers=2, heads=4,
                  input_resolution=32, out_indices=(0, 1), clip_proj_dim=16)
    vit_xla = CLIPVisionTransformer(attn_impl="xla", **kwargs)
    vit_ring = CLIPVisionTransformer(attn_impl="ring", **kwargs)

    img = jax.random.normal(jax.random.PRNGKey(8), (2, 32, 64, 3), jnp.float32)
    variables = vit_xla.init(jax.random.PRNGKey(0), img)
    ref = vit_xla.apply(variables, img)
    with ring_mesh(sp_mesh, "sp"):
        out = jax.jit(vit_ring.apply)(variables, img)
    assert len(out) == len(ref)
    for i, (a, b) in enumerate(zip(out, ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"tap {i}",
        )
