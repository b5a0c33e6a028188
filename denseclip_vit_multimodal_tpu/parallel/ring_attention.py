"""Sequence-parallel ring attention over an ICI mesh axis.

SURVEY.md §5.7: the reference has no long-context story — full [N, N] score
tensors on one device (reference: segmentation/denseclip/models.py:275,
311-344).  Single-chip Pallas kernels already serve DenseCLIP's 8k-token
whole frames; this module adds the named stretch: shard the SEQUENCE over a
mesh axis and rotate K/V shards around the ring with `jax.lax.ppermute`
(ICI neighbor exchanges), maintaining flash-style running statistics so the
result is the exact softmax attention:

    per ring step t (device i holds K/V shard (i - t) mod s):
        S   = q_local K_t^T * scale            [Nq/s, Nk/s] only
        m'  = max(m, rowmax(S))
        o   = o * exp(m - m') + exp(S - m') V_t
        l   = l * exp(m - m') + rowsum(exp(S - m'))
        (K, V) <- ppermute from the next ring neighbor
    out = o / l

Memory per device is O(N/s * D); each step's exchange is K/V-shard-sized and
overlaps with compute under XLA's scheduler.  Communication rides the ICI
ring — no all-gather of the full sequence ever materializes.

Differentiable (scan + ppermute have exact VJPs), exact for any `valid_len`
(global key positions are reconstructed per step from the ring rotation),
and tested for both on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

# Mesh stack for the `attn_impl: ring` model dispatch (models/layers.py::
# attention_core).  `ring_mesh(...)` pins an explicit mesh/axis; otherwise
# `current_ring_mesh()` lazily builds a 1-D ring over every visible device.
_RING_MESH_STACK: list = []


@contextlib.contextmanager
def ring_mesh(mesh: Mesh, axis_name: str = "ring"):
    """Pin the mesh/axis `attn_impl: ring` shards the sequence over.

    Must be active while the consuming computation is TRACED (first call of
    a jitted function) — the mesh is baked into the compiled program.
    """
    _RING_MESH_STACK.append((mesh, axis_name))
    try:
        yield
    finally:
        _RING_MESH_STACK.pop()


def current_ring_mesh() -> Optional[Tuple[Mesh, str]]:
    """(mesh, axis) for ring dispatch: the pinned context if any, else a
    1-D mesh over all devices; None when only one device is visible."""
    if _RING_MESH_STACK:
        return _RING_MESH_STACK[-1]
    devices = jax.devices()
    if len(devices) < 2:
        return None
    return Mesh(np.asarray(devices), ("ring",)), "ring"


def _ring_attention_local(
    q: jnp.ndarray,  # [B, Nq_local, H, Dh] this device's query shard
    k: jnp.ndarray,  # [B, Nk_local, H, Dh] this device's initial K/V shard
    v: jnp.ndarray,
    *,
    axis_name: str,
    sm_scale: float,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    size = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    nk_local = k.shape[1]
    neg = jnp.finfo(jnp.float32).min

    qf = (q * sm_scale).astype(q.dtype)

    def compute(o, m, l, k_cur, v_cur, t):
        # device i holds the K/V shard originally owned by (i - t) mod size
        shard = (my_idx - t) % size
        s = jnp.einsum(
            "bnhd,bmhd->bhnm", qf, k_cur, preferred_element_type=jnp.float32
        )  # [B, H, Nq, Nk_local]
        if valid_len is not None:
            col = shard * nk_local + jnp.arange(nk_local)
            s = jnp.where((col < valid_len)[None, None, None, :], s, neg)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))  # [B, H, Nq]
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)  # [B, H, Nq]
        l_new = l * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "bhnm,bmhd->bnhd",
            p.astype(q.dtype),
            v_cur,
            preferred_element_type=jnp.float32,
        )
        return o * corr.transpose(0, 2, 1)[..., None] + pv, m_new, l_new

    def step(carry, t):
        o, m, l, k_cur, v_cur = carry
        o, m, l = compute(o, m, l, k_cur, v_cur, t)
        perm = [(j, (j + 1) % size) for j in range(size)]
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (o, m, l, k_next, v_next), None

    b, nq, h, dh = q.shape
    # constants must be marked device-varying over the ring axis or the scan
    # carry types mismatch under shard_map's varying-axis tracking
    vary = lambda x: jax.lax.pcast(x, axis_name, to="varying")
    init = (
        vary(jnp.zeros((b, nq, h, dh), jnp.float32)),
        vary(jnp.full((b, h, nq), neg, jnp.float32)),
        vary(jnp.zeros((b, h, nq), jnp.float32)),
        k,
        v,
    )
    # size-1 compute+rotate steps in the scan, the LAST compute outside it:
    # the final rotation's result is never read, and XLA cannot DCE
    # collectives inside a scan body — keeping it wasted one full K/V-shard
    # ICI exchange per call.
    (o, m, l, k_last, v_last), _ = jax.lax.scan(
        step, init, jnp.arange(size - 1)
    )
    o, _, l = compute(o, m, l, k_last, v_last, size - 1)
    return (o / l.transpose(0, 2, 1)[..., None]).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # [B, N, H, Dh] GLOBAL arrays (sharded by the caller's
    k: jnp.ndarray,  # sharding or replicated; shard_map re-slices)
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "model",
    sm_scale: Optional[float] = None,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Exact softmax attention with the sequence sharded over `axis_name`.

    N must be divisible by the axis size (pad + `valid_len` otherwise, as
    the ViT's pad-once path already does).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    size = mesh.shape[axis_name]
    assert q.shape[1] % size == 0, (
        f"sequence {q.shape[1]} not divisible by {axis_name} axis ({size}); "
        "pad and pass valid_len"
    )
    spec = P(None, axis_name, None, None)
    fn = functools.partial(
        _ring_attention_local,
        axis_name=axis_name,
        sm_scale=float(sm_scale),
        valid_len=valid_len,
    )
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
