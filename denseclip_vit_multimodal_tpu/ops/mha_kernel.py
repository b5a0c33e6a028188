"""Custom Pallas TPU attention kernel for ViT-window shapes.

The bundled `jax.experimental.pallas.ops.tpu.flash_attention` streams K/V in
blocks with running-max bookkeeping — the right shape for 10k+ token
sequences, but at DenseCLIP's slide-window shapes (N~1.6k, D=64, B*H~120)
its grid/bookkeeping overhead leaves it ~4x off the roofline (measured
2.7-3.0 ms vs ~0.8 ms ideal on v5e).

At these sizes the whole K/V of one (batch, head) fits comfortably in VMEM
(2 x N x 64 bf16 = 448 KB at N=1792), so this kernel does the classic
one-shot formulation per q-tile:

    S = q K^T * scale   (fp32 on the MXU)
    P = softmax(S)      (single pass — no streaming statistics)
    O = P V             (bf16 matmul, fp32 accumulate)

Grid: (B*H, N/block_q) with the K/V block constant along the inner axis, so
Mosaic keeps K/V resident in VMEM across q-tiles instead of re-DMAing.
Padding to the 128-lane boundary is masked with -inf columns in-kernel.

Backward: a custom VJP recomputes gradients through the plain XLA attention
(exact same math) — with the frozen-tower training recipe the ViT backward
is dead-code anyway (see ops/attention.py), so this path only runs if a
user unfreezes the backbone.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_LANE = 128
_LOG2E = 1.4426950408889634  # softmax via exp2: scale*log2(e) folds into QK
# Budget for the fp32 score tile in VMEM.  Half the 16 MB/core: the softmax
# chain can hold a second score-sized temporary (exp / mask iota) alive, and
# K/V tiles + compiler scratch take the rest (an 10.6 MB tile OOMed at
# N=8320; 832-row tiles measured within 2% of 1664-row ones at N=1664).
_SCORE_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_block_q(n_pad: int, requested: int, score_bufs: int = 1) -> int:
    """Largest 128-multiple divisor of n_pad whose fp32 score tile fits VMEM.

    Bigger q-tiles amortize the per-program K/V residency and MXU ramp-up:
    at N=1601 (pad 1664) a single 1664-row tile measured 2.45 ms/layer vs
    2.96 ms for 512-row tiles.  `requested` caps the search (0 = no cap);
    `score_bufs` scales the budget for kernels holding several score tiles.
    """
    cap = requested if requested > 0 else n_pad
    budget = _SCORE_VMEM_BUDGET // max(score_bufs, 1)
    best = 8
    # Mosaic needs the q-tile (second-to-last block dim) to be a multiple of
    # 8 sublanes only; search all 8-multiple divisors of n_pad.
    for bq in range(8, n_pad + 1, 8):
        if n_pad % bq:
            continue
        if bq > cap:
            break
        if bq * n_pad * 4 <= budget:
            best = bq
    return best


def _xla_reference(q, k, v, scale, valid_len=None):
    """[BH, N, D] reference attention used for the VJP."""
    s = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if valid_len is not None and valid_len < s.shape[-1]:
        col = jnp.arange(s.shape[-1]) < valid_len
        s = jnp.where(col[None, None, :], s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bnm,bmd->bnd", p, v)


def _kernel(n_real: int, scale: float, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0]  # [bq, D]
    k = k_ref[0, 0]  # [Np, D]
    v = v_ref[0, 0]
    # exp(x*scale) == exp2(x*scale*log2e): base-2 exp is the VPU-native form.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)  # [bq, Np] fp32
    n_pad = s.shape[-1]
    if n_pad != n_real:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_real, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(q.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _mha_fwd_impl(
    q: jnp.ndarray,  # [B, H, N, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int,
    interpret: bool,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl

    b, h, n, d = q.shape
    real_n = valid_len if valid_len is not None else n
    n_pad = -(-n // _LANE) * _LANE
    if n_pad != n:
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    bq = _pick_block_q(n_pad, block_q)
    # Grid order: q-tiles innermost so the K/V block (indexed by batch and
    # head only) stays VMEM-resident across q-tiles.
    grid = (b, h, n_pad // bq)

    out = pl.pallas_call(
        functools.partial(_kernel, real_n, scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda i, hh, j: (i, hh, j, 0)),
            pl.BlockSpec((1, 1, n_pad, d), lambda i, hh, j: (i, hh, 0, 0)),
            pl.BlockSpec((1, 1, n_pad, d), lambda i, hh, j: (i, hh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda i, hh, j: (i, hh, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :n, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _mha(q, k, v, scale, block_q, interpret, valid_len):
    return _mha_fwd_impl(q, k, v, scale, block_q, interpret, valid_len)


def _mha_fwd(q, k, v, scale, block_q, interpret, valid_len):
    return (
        _mha_fwd_impl(q, k, v, scale, block_q, interpret, valid_len),
        (q, k, v),
    )


def _mha_bwd(scale, block_q, interpret, valid_len, residuals, g):
    q, k, v = residuals

    def ref(q, k, v):
        b, h, n, d = q.shape
        bh = lambda x: x.reshape(b * h, n, d)
        return _xla_reference(
            bh(q), bh(k), bh(v), scale, valid_len
        ).reshape(b, h, n, d)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_mha.defvjp(_mha_fwd, _mha_bwd)


def mha_attention(
    q: jnp.ndarray,  # [B, N, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    block_q: int = 0,  # 0 = auto: largest q-tile whose score block fits VMEM
    interpret: bool = False,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """One-shot Pallas attention; [B, N, H, D] in and out.  Exact, any N."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = _mha(qt, kt, vt, float(sm_scale), block_q, interpret, valid_len)
    return jnp.swapaxes(out, 1, 2)


# ---------------------------------------------------------------------------
# qkv-direct variant: consumes the fused QKV projection output [B, N, 3*H*D]
# without any head split / transpose.  The lane dimension is blocked in
# 128-lane tiles (= 128/D heads per program) with three views of the SAME
# array selected by index map: q tiles start at lane 0, k at H*D, v at 2*H*D.
# Removes ~4 full-tensor transposes + the 3-way split per layer that the
# [B,H,N,D] interface pays.
# ---------------------------------------------------------------------------


def _qkv_kernel(n_real: int, scale: float, heads_per_block: int,
                q_ref, k_ref, v_ref, o_ref):
    d = q_ref.shape[-1] // heads_per_block
    for h in range(heads_per_block):
        lo = h * d
        q = q_ref[0, :, lo : lo + d]  # [bq, D]
        k = k_ref[0, :, lo : lo + d]  # [Np, D]
        v = v_ref[0, :, lo : lo + d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)
        n_pad = s.shape[-1]
        if n_pad != n_real:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_real, s, jnp.finfo(jnp.float32).min)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, :, lo : lo + d] = o.astype(o_ref.dtype)


def _qkv_fwd_impl(qkv, num_heads, scale, block_q, interpret, valid_len=None):
    from jax.experimental import pallas as pl

    b, n, three_hd = qkv.shape
    real_n = valid_len if valid_len is not None else n
    hd = three_hd // 3
    head_dim = hd // num_heads
    heads_per_block = max(_LANE // head_dim, 1)
    n_pad = -(-n // _LANE) * _LANE
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
    bq = _pick_block_q(n_pad, block_q, score_bufs=heads_per_block)
    lane_block = head_dim * heads_per_block
    n_lane_blocks = hd // lane_block
    grid = (b, n_lane_blocks, n_pad // bq)

    # Lane-block index: q tiles live at [0, hd), k at [hd, 2hd), v at [2hd, 3hd).
    q_spec = pl.BlockSpec((1, bq, lane_block), lambda i, hh, j: (i, j, hh))
    k_spec = pl.BlockSpec(
        (1, n_pad, lane_block), lambda i, hh, j: (i, 0, n_lane_blocks + hh)
    )
    v_spec = pl.BlockSpec(
        (1, n_pad, lane_block), lambda i, hh, j: (i, 0, 2 * n_lane_blocks + hh)
    )
    out = pl.pallas_call(
        functools.partial(_qkv_kernel, real_n, scale, heads_per_block),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=pl.BlockSpec((1, bq, lane_block), lambda i, hh, j: (i, j, hh)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, hd), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out[:, :n, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _qkv_mha(qkv, num_heads, scale, block_q, interpret, valid_len):
    return _qkv_fwd_impl(qkv, num_heads, scale, block_q, interpret, valid_len)


def _qkv_ref(qkv, num_heads, scale, valid_len=None):
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    to_bh = lambda x: jnp.swapaxes(
        x.reshape(b, n, num_heads, d), 1, 2
    ).reshape(b * num_heads, n, d)
    out = _xla_reference(to_bh(q), to_bh(k), to_bh(v), scale, valid_len)
    return jnp.swapaxes(out.reshape(b, num_heads, n, d), 1, 2).reshape(b, n, hd)


def _qkv_fwd(qkv, num_heads, scale, block_q, interpret, valid_len):
    return (
        _qkv_fwd_impl(qkv, num_heads, scale, block_q, interpret, valid_len),
        (qkv,),
    )


def _qkv_bwd(num_heads, scale, block_q, interpret, valid_len, residuals, g):
    (qkv,) = residuals
    _, vjp = jax.vjp(lambda x: _qkv_ref(x, num_heads, scale, valid_len), qkv)
    return vjp(g)


_qkv_mha.defvjp(_qkv_fwd, _qkv_bwd)


def qkv_supported(num_heads: int, model_dim: int) -> bool:
    head_dim = model_dim // num_heads
    return head_dim in (64, 128) and (model_dim % _LANE == 0)


def mha_qkv_attention(
    qkv: jnp.ndarray,  # [B, N, 3*H*D] fused projection output
    num_heads: int,
    *,
    sm_scale: Optional[float] = None,
    block_q: int = 0,
    interpret: bool = False,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Attention straight off the fused QKV projection; returns [B, N, H*D]."""
    hd = qkv.shape[-1] // 3
    if sm_scale is None:
        sm_scale = (hd // num_heads) ** -0.5
    return _qkv_mha(
        qkv, num_heads, float(sm_scale), block_q, interpret, valid_len
    )
