#!/usr/bin/env python
"""Experiment: fuse the attention OUT-projection into the Pallas kernel.

The one untried kernel-fusion lever (round-3 ledger): the failed experiment
fused LN+QKV *before* attention; this fuses the `out` matmul *after* PV,
consuming [bq, lane_block] head tiles while they are still in VMEM —
skipping the HBM round trip of the attention output (51 MB/frame-layer)
and potentially overlapping the epilogue MXU work with the next grid
step's softmax VPU pass.

Design deltas vs ops/mha_kernel.py::_qkv_kernel:
- grid (b, q_tile, lane_block) with the LANE BLOCK innermost (today it is
  (b, lane_block, q_tile)): the fp32 [bq, model_dim] output block is
  indexed by (b, q_tile) only, so it stays VMEM-resident and accumulates
  partial out-projection products across lane blocks.  K/V blocks are
  re-fetched per q-tile (extra ~5 MB HBM/frame-layer = ~6 us — noise).
- W_out enters as a [lane_block, model_dim] block per lane-block step.
- outputs fp32 (accumulation dtype); the caller casts.

Measured same-session interleaved A/B on v5e (see __main__ output):
A = qkv-direct kernel + XLA out matmul, B = fused epilogue kernel.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from denseclip_vit_multimodal_tpu.ops.mha_kernel import (  # noqa: E402
    _LANE,
    _LOG2E,
    _exp2,
    _pick_block_q,
    mha_qkv_attention,
)


def _qkv_out_kernel(n_real: int, scale: float, heads_per_block: int,
                    zeroed_pads: bool, n_lane_blocks: int,
                    qkv_q_ref, k_ref, v_ref, w_ref, o_ref):
    from jax.experimental import pallas as pl

    hh = pl.program_id(2)
    d = qkv_q_ref.shape[-1] // heads_per_block
    n_pad = k_ref.shape[1]
    heads = []
    for h in range(heads_per_block):
        lo = h * d
        q = (qkv_q_ref[0, :, lo : lo + d] * (scale * _LOG2E)).astype(
            qkv_q_ref.dtype
        )
        k = k_ref[0, :, lo : lo + d]
        v = v_ref[0, :, lo : lo + d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if zeroed_pads and n_pad != n_real:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = _exp2(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            pads = n_pad - n_real
            pad_mass = pads * _exp2(-m.astype(jnp.float32))
            denom = jnp.maximum(
                denom - pad_mass, pad_mass * jnp.float32(1.2e-7)
            )
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_real, s, jnp.finfo(jnp.float32).min)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = _exp2(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        heads.append((o / denom).astype(qkv_q_ref.dtype))
    o_block = jnp.concatenate(heads, axis=-1)  # [bq, lane_block]
    partial = jax.lax.dot_general(
        o_block, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, model_dim]

    @pl.when(hh == 0)
    def _():
        o_ref[0] = partial

    @pl.when(hh != 0)
    def _():
        o_ref[0] += partial


def qkv_out_attention(qkv, w_out, num_heads, *, sm_scale=None, block_q=0,
                      interpret=False, valid_len=None):
    """[B, N, 3HD] qkv + [HD, HD] w_out -> [B, N, HD] fp32 (pre-bias)."""
    from jax.experimental import pallas as pl

    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    head_dim = hd // num_heads
    if sm_scale is None:
        sm_scale = head_dim ** -0.5
    heads_per_block = max(_LANE // head_dim, 1)
    real_n = valid_len if valid_len is not None else n
    n_pad = -(-n // _LANE) * _LANE
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
    # charge the fp32 [bq, hd] out block + double-buffered K/V variation
    bq = _pick_block_q(n_pad, block_q, extra_bytes=0)
    lane_block = head_dim * heads_per_block
    n_lane_blocks = hd // lane_block
    while bq * hd * 4 + 2 * bq * n_pad * 4 > 12 * 1024 * 1024 and bq > 8:
        bq //= 2  # shrink until score tiles + out block fit
    grid = (b, n_pad // bq, n_lane_blocks)

    q_spec = pl.BlockSpec((1, bq, lane_block), lambda i, j, hh: (i, j, hh))
    k_spec = pl.BlockSpec(
        (1, n_pad, lane_block), lambda i, j, hh: (i, 0, n_lane_blocks + hh)
    )
    v_spec = pl.BlockSpec(
        (1, n_pad, lane_block),
        lambda i, j, hh: (i, 0, 2 * n_lane_blocks + hh),
    )
    w_spec = pl.BlockSpec((lane_block, hd), lambda i, j, hh: (hh, 0))
    out = pl.pallas_call(
        functools.partial(
            _qkv_out_kernel, real_n, float(sm_scale), heads_per_block,
            valid_len is None, n_lane_blocks,
        ),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec, w_spec],
        out_specs=pl.BlockSpec((1, bq, hd), lambda i, j, hh: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, hd), jnp.float32),
        interpret=interpret,
    )(qkv, qkv, qkv, w_out)
    return out[:, :n, :]


def device_loop_time(fn, args, iters=30):
    """On-device fori_loop timing, perturbation-serialized, all outputs
    folded into the carry (CLAUDE.md methodology)."""

    @jax.jit
    def loop(args):
        def body(i, acc):
            perturbed = jax.tree.map(
                lambda x: x + (acc * 1e-20).astype(x.dtype), args
            )
            out = fn(*perturbed)
            return acc + jnp.float32(
                out[0, 0, :].astype(jnp.float32).sum()
                + out[0, -1, :].astype(jnp.float32).sum()
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    B, N, H, D = 10, 1601, 12, 64
    HD = H * D
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(
        rng.randn(B, N, 3 * HD).astype(np.float32), jnp.bfloat16
    )
    w = jnp.asarray(rng.randn(HD, HD).astype(np.float32) * 0.02, jnp.bfloat16)

    def a_fn(qkv, w):
        o = mha_qkv_attention(qkv, H)
        return jnp.dot(o, w, preferred_element_type=jnp.float32)

    def b_fn(qkv, w):
        return qkv_out_attention(qkv, w, H)

    # numeric agreement first
    ya = np.asarray(a_fn(qkv, w), np.float32)
    yb = np.asarray(b_fn(qkv, w), np.float32)
    err = np.abs(ya - yb).max() / (np.abs(ya).max() + 1e-9)
    print(f"rel err A vs B: {err:.3e}")

    # interleaved A/B/A/B same-session
    for tag, fn in (("A", a_fn), ("B", b_fn), ("A2", a_fn), ("B2", b_fn)):
        t = device_loop_time(fn, (qkv, w))
        print(f"{tag}: {t * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
