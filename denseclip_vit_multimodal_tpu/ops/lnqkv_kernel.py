"""Fused LayerNorm + QKV projection + one-shot attention (Pallas TPU).

The pre-LN ViT block (reference: segmentation/denseclip/models.py:271-294)
computes `attn(LN(x))`.  Left to XLA, that chain materializes two large HBM
tensors per layer at the slide-window shape ([B=10, N=1664, D=768]):
the normalized activations (2x25 MB) and the fused QKV projection
(2x76 MB written by the matmul, re-read by the attention kernel).  This
kernel keeps both on-chip:

  grid (batch, lane-block, q-tile), q-tile innermost:
    j == 0:  ln_x = LN(x_full)           (stats via a ones-matmul on the
                                          MXU — cross-lane VPU reductions
                                          are the slow direction)
             K_scr = ln_x @ Wk + bk       (lane block of K, VMEM-resident)
             V_scr = ln_x @ Wv + bv
    all j:   q = LN(x_tile) @ Wq + bq
             per head: S = q K^T (scale folded into q), exact softmax with
             deferred normalization, O = P V -> output lane block.

x, W, and the K/V scratch stay VMEM-resident across inner grid steps (their
block indices are constant in j / depend only on the outer axes), so HBM
traffic per layer drops to reading x once and writing the attention output.

Masking: `valid_len` columns are masked with -inf exactly like
ops/mha_kernel.py (pad rows of the residual stream are NOT zero — they carry
LN bias — so the zero-pad denominator correction does not apply here).

Backward: inference-path kernel.  Training uses the unfused path (Dense +
mha_kernel with its Pallas VJP); this op still defines an XLA-reference VJP
so stray gradients are correct, just not kernel-fast.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from denseclip_vit_multimodal_tpu.ops.mha_kernel import (
    _LANE,
    _LOG2E,
    _VMEM_SCOPED,
    _pick_block_q,
    _softmax_unnormalized,
)


def _ln_rows(x, gamma, beta, eps, out_dtype):
    """LayerNorm over the last dim with MXU-computed statistics.

    x [R, D] -> [R, D] in `out_dtype`; fp32 stats (models/layers.py:50
    semantics).  mean/E[x^2] come from one [R, D] x [D, 8] matmul each —
    the VPU's cross-lane reduction is the slow direction, the MXU's
    contraction is free by comparison.
    """
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    ones = jnp.full((d, 8), 1.0 / d, jnp.float32)
    mean = jax.lax.dot_general(
        xf, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[:, 0:1]
    msq = jax.lax.dot_general(
        xf * xf, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, 0:1]
    # One-pass variance (E[x^2] - mean^2) cancels catastrophically when
    # |mean| >> std: fp32 rounding of msq can exceed the true variance and
    # push var below -eps -> rsqrt(negative) = NaN.  Clamp to zero — the
    # clamped case means the row is (numerically) constant, where the
    # two-pass form would also produce ~0/eps.
    var = jnp.maximum(msq - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma + beta).astype(out_dtype)


_LN_CHUNK = 256  # rows per LN chunk: bounds the fp32 temporaries in VMEM


def _lnqkv_kernel(n_real: int, scale: float, heads_per_block: int, eps: float,
                  bq: int, x_f_ref, g_ref, b_ref,
                  wq_ref, wk_ref, wv_ref, bias_q_ref, bias_k_ref, bias_v_ref,
                  o_ref, ln_scr, k_scr, v_scr):
    from jax.experimental import pallas as pl

    j = pl.program_id(2)
    dt = x_f_ref.dtype
    gamma = g_ref[0]  # [D]
    beta = b_ref[0]
    n_pad = x_f_ref.shape[1]

    @pl.when(j == 0)
    def _project_kv():
        # LN in bounded row chunks (fp32 temporaries stay [chunk, D]), into
        # a bf16 scratch reused by every q-tile of this (batch, lane-block).
        # n_pad is a multiple of 128, so a dividing chunk <= _LN_CHUNK exists.
        chunk = next(
            c for c in range(min(_LN_CHUNK, n_pad), 0, -8) if n_pad % c == 0
        )
        for c in range(n_pad // chunk):
            lo = c * chunk
            ln_scr[lo : lo + chunk, :] = _ln_rows(
                x_f_ref[0, lo : lo + chunk, :], gamma, beta, eps, dt
            )
        k_scr[:] = (
            jax.lax.dot_general(
                ln_scr[:], wk_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias_k_ref[0]
        ).astype(dt)
        v_scr[:] = (
            jax.lax.dot_general(
                ln_scr[:], wv_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias_v_ref[0]
        ).astype(dt)

    ln_q = ln_scr[pl.ds(pl.multiple_of(j * bq, 8), bq), :]  # [bq, D]
    q_all = (
        jax.lax.dot_general(
            ln_q, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_q_ref[0]
    ) * (scale * _LOG2E)
    q_all = q_all.astype(dt)  # [bq, lane_block]

    d = q_all.shape[-1] // heads_per_block
    for h in range(heads_per_block):
        lo = h * d
        q = q_all[:, lo : lo + d]
        k = k_scr[:, lo : lo + d]
        v = v_scr[:, lo : lo + d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p, denom = _softmax_unnormalized(s, n_real, jnp.float32)
        o = jax.lax.dot_general(
            p.astype(dt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lo : lo + d] = (o / denom).astype(o_ref.dtype)


def _lnqkv_fwd_impl(x, gamma, beta, w_qkv, b_qkv, num_heads, scale, eps,
                    block_q, interpret, valid_len):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, d = x.shape
    three_hd = w_qkv.shape[1]
    hd = three_hd // 3
    head_dim = hd // num_heads
    heads_per_block = max(_LANE // head_dim, 1)
    real_n = valid_len if valid_len is not None else n
    n_pad = -(-n // _LANE) * _LANE
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        real_n = min(real_n, n)
    # LN + K/V projection of the full x happens once per (batch, lane
    # block); the LN temporaries are chunk-bounded, but the full-x input
    # block, the ln scratch and the K/V scratch stay VMEM-resident —
    # charge them so the q-tile search can't pick past scoped VMEM.
    lane_block = head_dim * heads_per_block
    resident = n_pad * 2 * (2 * d + 2 * lane_block)
    bq = _pick_block_q(
        n_pad, block_q, score_bufs=heads_per_block, extra_bytes=resident
    )
    n_lane_blocks = hd // lane_block
    grid = (b, n_lane_blocks, n_pad // bq)

    gamma2 = gamma.reshape(1, d).astype(jnp.float32)
    beta2 = beta.reshape(1, d).astype(jnp.float32)
    bias2 = b_qkv.reshape(1, three_hd).astype(jnp.float32)
    w_qkv = w_qkv.astype(x.dtype)  # bf16 operands for the MXU, fp32 accum

    w_spec = lambda part: pl.BlockSpec(
        (d, lane_block), lambda i, hh, j, p=part: (0, p * n_lane_blocks + hh)
    )
    bias_spec = lambda part: pl.BlockSpec(
        (1, lane_block), lambda i, hh, j, p=part: (0, p * n_lane_blocks + hh)
    )
    out = pl.pallas_call(
        functools.partial(
            _lnqkv_kernel, real_n, scale, heads_per_block, eps, bq
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad, d), lambda i, hh, j: (i, 0, 0)),
            pl.BlockSpec((1, d), lambda i, hh, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, hh, j: (0, 0)),
            w_spec(0),
            w_spec(1),
            w_spec(2),
            bias_spec(0),
            bias_spec(1),
            bias_spec(2),
        ],
        out_specs=pl.BlockSpec((1, bq, lane_block), lambda i, hh, j: (i, j, hh)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, hd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_pad, d), x.dtype),
            pltpu.VMEM((n_pad, lane_block), x.dtype),
            pltpu.VMEM((n_pad, lane_block), x.dtype),
        ],
        interpret=interpret,
    )(x, gamma2, beta2, w_qkv, w_qkv, w_qkv, bias2, bias2, bias2)
    return out[:, :n, :]


def _lnqkv_reference(x, gamma, beta, w_qkv, b_qkv, num_heads, scale, eps,
                     valid_len=None):
    """XLA reference: LN (fp32 stats) -> QKV -> per-head softmax attention."""
    from denseclip_vit_multimodal_tpu.ops.mha_kernel import _qkv_ref

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    qkv = (ln @ w_qkv.astype(x.dtype)) + b_qkv.astype(x.dtype)
    return _qkv_ref(qkv, num_heads, scale, valid_len)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _lnqkv(x, gamma, beta, w_qkv, b_qkv, num_heads, scale, eps, block_q,
           interpret, valid_len):
    return _lnqkv_fwd_impl(
        x, gamma, beta, w_qkv, b_qkv, num_heads, scale, eps, block_q,
        interpret, valid_len,
    )


def _lnqkv_fwd(x, gamma, beta, w_qkv, b_qkv, num_heads, scale, eps, block_q,
               interpret, valid_len):
    out = _lnqkv_fwd_impl(
        x, gamma, beta, w_qkv, b_qkv, num_heads, scale, eps, block_q,
        interpret, valid_len,
    )
    return out, (x, gamma, beta, w_qkv, b_qkv)


def _lnqkv_bwd(num_heads, scale, eps, block_q, interpret, valid_len,
               residuals, g):
    x, gamma, beta, w_qkv, b_qkv = residuals
    _, vjp = jax.vjp(
        lambda *a: _lnqkv_reference(*a, num_heads, scale, eps, valid_len),
        x, gamma, beta, w_qkv, b_qkv,
    )
    return vjp(g.astype(jnp.float32).astype(x.dtype))


_lnqkv.defvjp(_lnqkv_fwd, _lnqkv_bwd)


def lnqkv_supported(num_heads: int, model_dim: int, n: int = 0) -> bool:
    head_dim = model_dim // num_heads
    if not (head_dim in (64, 128) and model_dim % _LANE == 0):
        return False
    if n:
        # The fused kernel's VMEM residents scale with sequence length: the
        # full-x input block + ln scratch ([n_pad, D] bf16 each) and the
        # K/V scratch ([n_pad, lane_block] bf16 x 2).  Past the point where
        # they plus one minimal 8-row score tile exceed scoped VMEM the
        # compile OOMs — whole-frame shapes must take the unfused path.
        lane_block = max(_LANE // head_dim, 1) * head_dim
        n_pad = -(-n // _LANE) * _LANE
        resident = n_pad * 2 * (2 * model_dim + 2 * lane_block)
        if resident + 8 * n_pad * 4 * 2 > _VMEM_SCOPED:
            return False
    return True


def ln_qkv_attention(
    x: jnp.ndarray,  # [B, N, D] residual stream (pre-LN input)
    gamma: jnp.ndarray,  # [D] ln_1 scale
    beta: jnp.ndarray,  # [D] ln_1 bias
    w_qkv: jnp.ndarray,  # [D, 3*H*Dh]
    b_qkv: jnp.ndarray,  # [3*H*Dh]
    num_heads: int,
    *,
    sm_scale: Optional[float] = None,
    eps: float = 1e-5,
    block_q: int = 0,
    interpret: bool = False,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Fused LN(x) -> QKV -> attention; returns [B, N, H*Dh] (pre out-proj)."""
    hd = w_qkv.shape[1] // 3
    if sm_scale is None:
        sm_scale = (hd // num_heads) ** -0.5
    return _lnqkv(
        x, gamma, beta, w_qkv, b_qkv,
        num_heads, float(sm_scale), float(eps), block_q, interpret, valid_len,
    )
