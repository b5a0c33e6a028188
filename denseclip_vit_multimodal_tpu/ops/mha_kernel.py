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

Backward: a Pallas kernel in the same one-shot formulation — recompute S and
the exact softmax from q/k/v (the full row fits VMEM, so no lse residual),
dP = dO V^T, D = rowsum(P ∘ dP), dS = P ∘ (dP − D), then dQ/dK/dV as three
MXU contractions with dK/dV accumulated in VMEM-resident fp32 output blocks
across q-tiles.  O(N) memory — the shipped heritage recipe (backbone lr x0.1)
trains without the O(N^2) score materialization the round-1 XLA-recompute
VJP paid.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_LANE = 128
# Optionally run the softmax exp pass in bf16.  Measured on v5e: NO speedup
# over fp32 exp (the VPU does not pack bf16 transcendentals; 1.97 vs 1.95
# ms at the slide shape) and a small accuracy cost, so default OFF.  The
# division-by-denominator is deferred to the [bq, D] output unconditionally
# (2.10 -> 1.95 ms: one fewer full VPU pass over the score tile).
_EXP_BF16 = os.environ.get("DENSECLIP_EXP_BF16", "0") == "1"
_LOG2E = 1.4426950408889634  # softmax via exp2: scale*log2(e) folds into QK
# Fast softmax exponential: replace the VPU transcendental exp2 over the
# [bq, N] score tile with exponent-bit assembly + a cubic mantissa
# polynomial (cheap ALU ops only).  Env-gated for measurement; see
# _exp2_poly for the accuracy budget.
_FAST_EXP2 = os.environ.get("DENSECLIP_FAST_EXP2", "0") == "1"
# Cubic minimax for 2^f on [0,1): max relative error 8.4e-5 — an order of
# magnitude below the bf16 quantization the exp output suffers anyway when
# cast for the PV matmul.
_E2C0 = 0.9999413315491341
_E2C1 = 0.6957344083154011
_E2C2 = 0.2261244071264617
_E2C3 = 0.07808251030411106


def _exp2_poly(x: jnp.ndarray) -> jnp.ndarray:
    """2^x for x <= 0, fp32, via exponent-field bit assembly.

    Split x = xi + xf with xi = floor(x) and xf in [0, 1); evaluate the
    cubic for 2^xf (value in [1, 2), so its float32 exponent field is
    exactly 127) and add xi straight into the exponent bits — no transcendental.
    Inputs are clamped at -126 (softmax weight < 1.2e-38: zero for every
    purpose here, and the clamp keeps the bit arithmetic out of denormals).
    """
    x = jnp.maximum(x, -126.0)
    xi = jnp.floor(x)
    xf = x - xi
    p = _E2C0 + xf * (_E2C1 + xf * (_E2C2 + xf * _E2C3))
    bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    bits = bits + (xi.astype(jnp.int32) << 23)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _exp2(x: jnp.ndarray) -> jnp.ndarray:
    # The bit-assembly path needs the float32 layout; other dtypes (the
    # opt-in bf16 exp experiment) keep the transcendental.
    if _FAST_EXP2 and x.dtype == jnp.float32:
        return _exp2_poly(x)
    return jnp.exp2(x)
# Scoped-VMEM model for the q-tile search.  Mosaic's scoped allocation is
# 16 MB/core; besides `score_bufs` fp32 score tiles the kernel keeps one
# score-sized temporary for the exp chain alive, plus the DOUBLE-BUFFERED
# K/V input blocks ([n_pad, 128] bf16 x 2 arrays x 2 buffers — their index
# map varies over the outer grid axes, so Mosaic pipelines them), plus
# small q/o tiles and compiler scratch.  A flat score budget ignored the
# K/V term and OOMed at N=8320 (17.58 M > 16 M) once the budget was raised
# to buy the 832-row tile at the slide shape.
_VMEM_SCOPED = 14 * 1024 * 1024  # 16 MB minus q/o tiles + scratch headroom


def _pick_block_q(
    n_pad: int, requested: int, score_bufs: int = 1, extra_bytes: int = 0
) -> int:
    """Largest 8-multiple divisor of n_pad whose working set fits VMEM.

    Bigger q-tiles amortize the per-program K/V residency and MXU ramp-up:
    at N=1601 (pad 1664) an 832-row tile measured within 2% of a single
    1664-row one (which OOMs), and 2x faster than 512-row tiles.
    `requested` caps the search (0 = no cap); `score_bufs` is how many
    score-sized fp32 tiles the kernel holds at once (forward 1, backward 3);
    `extra_bytes` charges non-score VMEM residents the caller knows about
    (the backward's fp32 dk/dv whole-sequence output blocks).
    """
    cap = requested if requested > 0 else n_pad
    # bf16, K+V; double-buffered at window shapes.  At whole-frame sizes the
    # double-buffer charge is empirically too conservative: on v5e at
    # N=8320 a 128-row tile (score+temp+K/V nominally 17.0 M) compiles and
    # runs 2.5% faster than the 80-row tile the full charge allows, while
    # 208 rows genuinely OOMs — so charge K/V single-buffered there.
    # FORWARD only (score_bufs == 1): the backward additionally keeps
    # VMEM-resident fp32 dk/dv output blocks alive, and its relaxed picks
    # were never measured on hardware — keep the conservative charge.
    kv_buffers = 2 if (n_pad < 8192 or score_bufs > 1) else 1
    kv_bytes = n_pad * _LANE * 2 * 2 * kv_buffers
    budget = max(_VMEM_SCOPED - kv_bytes - extra_bytes, 1024 * 1024)
    per_tile = budget // (max(score_bufs, 1) + 1)  # +1: exp-chain temporary
    best = 8
    # Mosaic needs the q-tile (second-to-last block dim) to be a multiple of
    # 8 sublanes only; search all 8-multiple divisors of n_pad.
    for bq in range(8, n_pad + 1, 8):
        if n_pad % bq:
            continue
        if bq > cap:
            break
        if bq * n_pad * 4 <= per_tile:
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


def _softmax_unnormalized(s: jnp.ndarray, n_real: int, p_dtype):
    """Masked, max-shifted exp2 WITHOUT the normalizing division.

    Returns (p, denom): the [bq, N] division is deferred to the [bq, D]
    output (o / denom) — one full VPU pass over the score tile saved.
    (A ones-matmul MXU rowsum for the denominator was MEASURED SLOWER:
    kernel 1.89 -> 2.11 ms — the extra MXU op serializes against QK/PV.)
    """
    n_pad = s.shape[-1]
    if n_pad != n_real:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_real, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = _exp2((s - m).astype(p_dtype))
    denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
    return p, denom


def _kernel(n_real: int, scale: float, exp_bf16: bool, q_ref, k_ref, v_ref,
            o_ref):
    # exp(x*scale) == exp2(x*scale*log2e): base-2 exp is the VPU-native form;
    # the scale folds into the [bq, D] q operand, not the [bq, N] scores.
    q = (q_ref[0, 0] * (scale * _LOG2E)).astype(q_ref.dtype)  # [bq, D]
    k = k_ref[0, 0]  # [Np, D]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, Np] fp32
    # bf16 exp only when the compute dtype is already bf16 (p feeds the PV
    # matmul in q.dtype regardless); fp32 inputs keep the exact fp32 exp.
    p, denom = _softmax_unnormalized(
        s, n_real,
        jnp.bfloat16 if (exp_bf16 and q.dtype == jnp.bfloat16) else jnp.float32,
    )
    o = jax.lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)


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
        functools.partial(_kernel, real_n, scale, _EXP_BF16),
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


# ---------------------------------------------------------------------------
# Pallas backward: flash-style dq/dk/dv in the one-shot regime.  Recomputes
# S and the exact softmax from the residual q/k/v (no lse residual needed:
# the full row fits VMEM), then uses the identity
#     D_i = rowsum(dO ∘ O)_i = rowsum(P ∘ dP)_i
# so O need not be saved either.  dK/dV accumulate in fp32 output blocks
# that stay VMEM-resident across q-tiles (index constant in the inner grid
# axis).  This replaces the round-1 XLA-recompute VJP, whose full [N, N]
# score materialization made the shipped heritage recipe (backbone lr x0.1,
# reference denseclip_fpn_vit-b_640x640_80k.py:53-63) pay O(N^2) HBM in
# memory and time on every step.
# ---------------------------------------------------------------------------


def _bwd_kernel(n_real: int, scale: float, zeroed_pads: bool,
                q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    from jax.experimental import pallas as pl

    j = pl.program_id(2)
    q = q_ref[0, 0]  # [bq, D]
    k = k_ref[0, 0]  # [Np, D]
    v = v_ref[0, 0]
    do = do_ref[0, 0]  # [bq, D]

    # Same VPU-pass diet as the forward (measured -7.3% at the heritage
    # 640x640 train shape): scale*log2e folds into the [bq, D] q operand,
    # the softmax division defers into per-row scalars, and our own zero
    # pads use the exact denominator correction instead of a mask pass.
    qs = (q * (scale * _LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, Np]
    n_pad = s.shape[-1]
    if not zeroed_pads and n_pad != n_real:
        # caller-provided pads hold arbitrary data: mask them out exactly
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_real, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = _exp2(s - m)  # unnormalized; division deferred
    denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
    if zeroed_pads and n_pad != n_real:
        # zero pad columns score exactly 0 -> each contributes exp2(-m) to
        # the denominator; subtract that mass (and floor against the fp32
        # absorption pathology, same as the forward kernel).
        pads = n_pad - n_real
        pad_mass = pads * _exp2(-m)
        denom = jnp.maximum(denom - pad_mass, pad_mass * jnp.float32(1.2e-7))
    r = 1.0 / denom  # [bq, 1]

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, Np]; zeroed v pads make the pad columns exactly 0
    # rowsum(P ∘ dP) == D, computed on the unnormalized p and normalized once
    dcoef = jnp.sum(p * dp, axis=-1, keepdims=True) * r
    # the softmax division rides the per-row (scale * r) factor
    ds = (p * (dp - dcoef) * (scale * r)).astype(q.dtype)
    pc = p.astype(q.dtype)
    dor = (do.astype(jnp.float32) * r).astype(q.dtype)  # [bq, D] division

    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # contract over the q-tile rows: ds^T @ q, p^T @ (do/denom)
    dk_j = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_j = jax.lax.dot_general(
        pc, dor, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        dk_ref[0, 0] = dk_j
        dv_ref[0, 0] = dv_j

    @pl.when(j != 0)
    def _():
        dk_ref[0, 0] += dk_j
        dv_ref[0, 0] += dv_j


def _mha_bwd_pallas(q, k, v, do, scale, block_q, interpret, valid_len):
    """dq/dk/dv for [B, H, N, D] inputs via the one-shot backward kernel."""
    from jax.experimental import pallas as pl

    b, h, n, d = q.shape
    real_n = valid_len if valid_len is not None else n
    n_pad = -(-n // _LANE) * _LANE
    if n_pad != n:
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q, k, v, do = (jnp.pad(x, pad) for x in (q, k, v, do))
    # three fp32 score-sized temporaries live at once (s/p, dp, ds), and
    # the fp32 dk/dv whole-sequence output blocks stay VMEM-resident across
    # the q-tile grid axis — charge them or long-sequence picks OOM.
    bq = _pick_block_q(
        n_pad, block_q, score_bufs=3, extra_bytes=2 * n_pad * d * 4
    )
    grid = (b, h, n_pad // bq)

    tile = lambda: pl.BlockSpec((1, 1, bq, d), lambda i, hh, j: (i, hh, j, 0))
    full = lambda: pl.BlockSpec((1, 1, n_pad, d), lambda i, hh, j: (i, hh, 0, 0))
    dq, dk, dv = pl.pallas_call(
        # zeroed_pads: padding added by this wrapper is exactly zero, so the
        # kernel can use the denominator correction; a caller-provided
        # valid_len means arbitrary pad data and keeps the mask pass.
        functools.partial(_bwd_kernel, real_n, scale, valid_len is None),
        grid=grid,
        in_specs=[tile(), full(), full(), tile()],
        out_specs=[tile(), full(), full()],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do)
    trim = lambda x: x[:, :, :n, :]
    return trim(dq), trim(dk), trim(dv)


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
    dq, dk, dv = _mha_bwd_pallas(
        q, k, v, g.astype(q.dtype), scale, block_q, interpret, valid_len
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


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
                exp_bf16: bool, zeroed_pads: bool,
                q_ref, k_ref, v_ref, o_ref):
    d = q_ref.shape[-1] // heads_per_block
    n_pad = k_ref.shape[1]
    for h in range(heads_per_block):
        lo = h * d
        # Fold scale*log2(e) into the q operand: a [bq, D] multiply instead
        # of a pass over the [bq, N] score tile.
        q = (q_ref[0, :, lo : lo + d] * (scale * _LOG2E)).astype(q_ref.dtype)
        k = k_ref[0, :, lo : lo + d]  # [Np, D]
        v = v_ref[0, :, lo : lo + d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if zeroed_pads and n_pad != n_real:
            # Caller zeroed k/v rows >= n_real, so those score COLUMNS are
            # exactly 0 and every pad key contributes exactly exp2(0 - m) to
            # the denominator: subtract it instead of running an
            # iota+compare+select mask pass over the score tile.  (m >= 0 by
            # construction since the 0 columns participate in the max.)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = _exp2(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            # same exp approximation as the tile so the pad-column
            # contribution cancels exactly
            pads = n_pad - n_real
            pad_mass = pads * _exp2(-m.astype(jnp.float32))
            denom = denom - pad_mass
            # Catastrophic-cancellation guard: if every REAL score of a row
            # sits ~24 bits below the pad columns' 0, the fp32 sum absorbs
            # the real mass entirely and denom lands on exactly 0 -> inf/NaN
            # out.  Floor at the absorption threshold (pads * fp32 ulp of
            # the pad mass): o is bounded by the same lost mass, so the
            # pathological row degrades to a bounded ~0 output instead.
            denom = jnp.maximum(denom, pad_mass * jnp.float32(1.2e-7))
        else:
            p, denom = _softmax_unnormalized(
                s.astype(jnp.float32), n_real,
                jnp.bfloat16
                if (exp_bf16 and q.dtype == jnp.bfloat16)
                else jnp.float32,
            )
        o = jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lo : lo + d] = (o / denom).astype(o_ref.dtype)


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
    # the per-head loop keeps ONE score tile live at a time, so the tile
    # budget matches the single-head kernel's (bq 416 -> 832 at N=1664)
    bq = _pick_block_q(n_pad, block_q)
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
        functools.partial(
            # zeroed_pads: when masking comes only from our own jnp.pad the
            # pad rows are exactly zero, so the kernel can use the exact
            # denominator correction instead of a mask pass (measured -4%
            # kernel time); a caller-provided valid_len keeps the mask.
            _qkv_kernel, real_n, scale, heads_per_block, _EXP_BF16,
            valid_len is None,
        ),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=pl.BlockSpec(
            (1, bq, lane_block), lambda i, hh, j: (i, j, hh)
        ),
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
    """Pallas backward for the qkv-direct forward.

    Head split/merge transposes are O(N*D) passes — noise next to the
    O(N^2) matmuls — so the backward reuses the [B, H, N, D] kernel.
    """
    (qkv,) = residuals
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    to_bhnd = lambda x: jnp.swapaxes(x.reshape(b, n, num_heads, d), 1, 2)
    dq, dk, dv = _mha_bwd_pallas(
        to_bhnd(q), to_bhnd(k), to_bhnd(v), to_bhnd(g.astype(qkv.dtype)),
        scale, block_q, interpret, valid_len,
    )
    back = lambda x: jnp.swapaxes(x, 1, 2).reshape(b, n, hd)
    dqkv = jnp.concatenate([back(dq), back(dk), back(dv)], axis=-1)
    return (dqkv.astype(qkv.dtype),)


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


# ---------------------------------------------------------------------------
# Opt-in int8 attention (serving): both MXU contractions run at the v5e's
# doubled int8 rate.  Measured floors at the slide-window shape (b*h=120,
# N=1664, D=64): bf16 QK+PV pair 1.77 ms, int8 pair 1.14 ms.  Quantization:
# symmetric per-(batch, head) scales for q/k/v computed outside the kernel
# (one absmax + one round pass over the qkv projection); softmax stays
# EXACT fp32 in-kernel with the dequant multiplier folded into the exp2
# input; the probability tile re-quantizes with the fixed scale 127 (the
# max-shifted unnormalized row max is exactly exp2(0) = 1), and the
# denominator comes from the pre-quantization fp32 tile (~0.4% mismatch vs
# the quantized numerator — inside the int8 error budget, and one VPU pass
# cheaper).  No reference equivalent (torch/cuDNN fp16/fp32 only);
# this path intentionally trades bit-parity for throughput and is gated
# behind `tpu.attn_impl: int8`.  Backward: straight-through — the VJP runs
# the bf16 Pallas backward on the pre-quantization qkv.
# ---------------------------------------------------------------------------


def _qkv_int8_kernel(n_real: int, scale: float, heads_per_block: int,
                     q_ref, k_ref, v_ref, sc_ref, o_ref):
    # VPU-pass budget: the int8 MXU pair runs ~1.14 ms at the slide shape,
    # so the elementwise work over the [bq, N] tile must stay at the bf16
    # kernel's ~5 passes to overlap.  Hence truncating casts (no
    # round/clip — p*127 <= 127 by construction) and the fp32 denominator
    # from the PRE-quantization tile (~0.4% normalization mismatch, inside
    # the int8 error budget).  Pad columns are ALWAYS -inf-masked here:
    # the bf16 kernel's cheaper zeroed-pads denominator correction is
    # unsound under the fixed-127 probability scale — a row whose real
    # scores all sit below the pads' 0 would see its max pulled to 0 and
    # every real p*127 truncate to zero (100% error), so the mask pass is
    # the price of correctness on this path.
    d = q_ref.shape[-1] // heads_per_block
    n_pad = k_ref.shape[1]
    for h in range(heads_per_block):
        lo = h * d
        q = q_ref[0, :, lo : lo + d]  # int8 [bq, D]
        k = k_ref[0, :, lo : lo + d]  # int8 [Np, D]
        v = v_ref[0, :, lo : lo + d]
        sq = sc_ref[0, 0, h, 0]
        sk = sc_ref[0, 0, h, 1]
        sv = sc_ref[0, 0, h, 2]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        # dequant + softmax temperature in ONE multiplier on the int32->fp32
        # cast (the bf16 kernel folds this into the q operand; int8 operands
        # cannot carry it)
        sf = s.astype(jnp.float32) * (sq * sk * scale * _LOG2E)
        if n_pad != n_real:
            col = jax.lax.broadcasted_iota(jnp.int32, sf.shape, 1)
            sf = jnp.where(col < n_real, sf, jnp.finfo(jnp.float32).min)
        m = jnp.max(sf, axis=-1, keepdims=True)
        p = jnp.exp2(sf - m)
        denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        # +0.5 makes the truncating cast round half-up (p >= 0): one
        # fused add instead of a round+clip pass
        p8 = (p * 127.0 + 0.5).astype(jnp.int8)
        o = jax.lax.dot_general(
            p8, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        o_ref[0, :, lo : lo + d] = (
            o.astype(jnp.float32) * (sv / 127.0) / jnp.maximum(denom, 1e-20)
        ).astype(o_ref.dtype)


def _qkv_int8_fwd_impl(qkv, num_heads, scale, block_q, interpret,
                       valid_len=None):
    from jax.experimental import pallas as pl

    b, n, three_hd = qkv.shape
    real_n = valid_len if valid_len is not None else n
    hd = three_hd // 3
    head_dim = hd // num_heads
    heads_per_block = max(_LANE // head_dim, 1)
    n_pad = -(-n // _LANE) * _LANE
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
    if valid_len is not None and valid_len < n:
        # Rows in [valid_len, n) are caller padding with arbitrary content;
        # zero them so the per-head abs-max (and hence the quantization
        # scales) reflects only real tokens.  The kernel -inf-masks those
        # score columns regardless, so the zeroing only affects the scales.
        row = jnp.arange(n_pad) < valid_len
        # where, not multiply: 0 * inf/NaN pad garbage would poison the
        # abs-max scales (and thus every output row) instead of zeroing.
        qkv = jnp.where(row[None, :, None], qkv, jnp.zeros((), qkv.dtype))

    # symmetric per-(batch, head) quantization of q/k/v: TWO passes over the
    # projection (abs-max reduce; bf16 multiply + truncating int8 cast).
    # The last-dim split reshape is layout-free; everything stays in the
    # compute dtype (integers <= 127 are exact in bf16) and XLA fuses the
    # multiply/rint/cast into the same pass — the fp32 round/clip chain
    # this replaces measured 0.9 ms at the slide shape.
    grouped = qkv.reshape(b, n_pad, 3, num_heads, head_dim)
    amax = jnp.max(jnp.abs(grouped), axis=(1, 4)).astype(jnp.float32)
    scales = jnp.maximum(amax, 1e-6) / 127.0  # [B, 3, H] fp32
    inv = (127.0 / jnp.maximum(amax, 1e-6)).astype(qkv.dtype)
    q8 = jnp.rint(grouped * inv[:, None, :, :, None]).astype(
        jnp.int8
    ).reshape(b, n_pad, three_hd)
    n_lane_blocks = hd // (head_dim * heads_per_block)
    # [B, n_lane_blocks, heads_per_block, 4]: (sq, sk, sv, pad) per head,
    # grouped to match the kernel's lane-block walk; last-two block dims
    # equal the array dims, so Mosaic accepts the small fp32 tile.
    sc = jnp.moveaxis(scales, 1, 2).reshape(
        b, n_lane_blocks, heads_per_block, 3
    )
    sc = jnp.concatenate([sc, jnp.zeros_like(sc[..., :1])], axis=-1)

    # The int8 kernel's per-head working set exceeds the bf16 model
    # _pick_block_q was calibrated against: fp32 sf tile + fp32 p tile +
    # int8 p8 tile live at once (~2.25 score-equivalents vs 1).  Charge it
    # score_bufs=2 (with the +1 exp-chain temp that's 3 tile budgets); K/V
    # are still charged at bf16 width though they are int8 here — extra
    # headroom on the conservative side of Mosaic's scoped-VMEM limit.
    bq = _pick_block_q(n_pad, block_q, score_bufs=2)
    lane_block = head_dim * heads_per_block
    grid = (b, n_lane_blocks, n_pad // bq)
    q_spec = pl.BlockSpec((1, bq, lane_block), lambda i, hh, j: (i, j, hh))
    k_spec = pl.BlockSpec(
        (1, n_pad, lane_block), lambda i, hh, j: (i, 0, n_lane_blocks + hh)
    )
    v_spec = pl.BlockSpec(
        (1, n_pad, lane_block), lambda i, hh, j: (i, 0, 2 * n_lane_blocks + hh)
    )
    sc_spec = pl.BlockSpec(
        (1, 1, heads_per_block, 4), lambda i, hh, j: (i, hh, 0, 0)
    )
    out = pl.pallas_call(
        functools.partial(
            _qkv_int8_kernel, real_n, scale, heads_per_block,
        ),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec, sc_spec],
        out_specs=pl.BlockSpec(
            (1, bq, lane_block), lambda i, hh, j: (i, j, hh)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, hd), qkv.dtype),
        interpret=interpret,
    )(q8, q8, q8, sc)
    return out[:, :n, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _qkv_mha_int8(qkv, num_heads, scale, block_q, interpret, valid_len):
    return _qkv_int8_fwd_impl(
        qkv, num_heads, scale, block_q, interpret, valid_len
    )


def _qkv_int8_fwd(qkv, num_heads, scale, block_q, interpret, valid_len):
    return (
        _qkv_int8_fwd_impl(qkv, num_heads, scale, block_q, interpret, valid_len),
        (qkv,),
    )


_qkv_mha_int8.defvjp(_qkv_int8_fwd, _qkv_bwd)  # straight-through bf16 backward


def mha_qkv_attention_int8(
    qkv: jnp.ndarray,  # [B, N, 3*H*D] fused projection output
    num_heads: int,
    *,
    sm_scale: Optional[float] = None,
    block_q: int = 0,
    interpret: bool = False,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Quantized one-shot attention; [B, N, 3*H*D] -> [B, N, H*D].

    Opt-in serving path (`tpu.attn_impl: int8`): ~0.5% relative error on the
    attention output in exchange for the MXU's doubled int8 rate.  The
    backward pass is straight-through (bf16 Pallas kernels on the
    pre-quantization qkv).
    """
    hd = qkv.shape[-1] // 3
    if sm_scale is None:
        sm_scale = (hd // num_heads) ** -0.5
    return _qkv_mha_int8(
        qkv, num_heads, float(sm_scale), block_q, interpret, valid_len
    )
