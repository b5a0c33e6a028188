"""Shared transformer / conv building blocks (Flax linen, NHWC, bf16-friendly).

TPU-native re-design of the reference's module zoo
(reference: segmentation/denseclip/models.py):

  * `LayerNorm` — fp32-stable layer norm matching the reference's fp16-safe
    subclass (models.py:243-249): statistics and affine in fp32, cast back.
  * `QuickGELU` — x * sigmoid(1.702 x) (models.py:252-254).
  * `MultiHeadAttention` — CLIP-style MHA with a *fused* QKV projection
    (one [D, 3D] matmul feeding the MXU, unlike torch's nn.MultiheadAttention
    packed-weight emulation), optional causal masking, and a pluggable
    attention core (XLA einsum softmax or a Pallas flash kernel).
  * `MLP` — c_fc -> QuickGELU -> c_proj (models.py:277-281).
  * `ResidualAttentionBlock` — pre-LN block (models.py:271-294) with
    per-sample stochastic depth.
  * `Transformer` — a `nn.scan` stack: the block is compiled ONCE and iterated
    by XLA, with per-layer drop-path rates as a scanned input; taps for
    intermediate layers fall out of the scan for free.  NOTE: the reference's
    `Transformer.forward` applies its blocks TWICE due to a bug
    (models.py:305-307); we implement single-pass CLIP semantics and document
    the divergence (see SURVEY.md §7 "hard parts").
  * `ConvBNReLU` — conv + (batch)norm + relu in NHWC (models.py:13-20).

All dense/conv compute can run in bf16 (`dtype`), with fp32 parameters and
fp32 softmax/normalization for stability.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any

# Transformer stacks that requested pipelining but had to fall back warn
# once per offending (layers, batch, stages, microbatches) shape.
_PIPELINE_FALLBACK_WARNED: set = set()

# Attention core implementations, selectable per-module or globally.
ATTN_XLA = "xla"
ATTN_FLASH = "flash"  # Pallas flash attention (TPU only)
ATTN_AUTO = "auto"
ATTN_INT8 = "int8"  # opt-in quantized serving path (TPU only, ~0.5% rel err)
ATTN_RING = "ring"  # opt-in sequence-parallel ring attention (>= 2 devices)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's GELU approximation (reference models.py:252-254)."""
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm_apply(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    epsilon: float = 1e-5,
) -> jnp.ndarray:
    """fp32-stats layer norm given explicit affine params."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + epsilon)
    return (y * scale + bias).astype(orig_dtype)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of input dtype.

    Matches the reference's fp16-safe LayerNorm (models.py:243-249): the input
    is upcast to fp32 for normalization + affine, then cast back.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return layer_norm_apply(x, scale, bias, self.epsilon)


class _LNParams(nn.Module):
    """Creates LayerNorm's exact param tree and returns the raw arrays.

    Used by the fused LN+QKV+attention path: the kernel needs the affine
    params explicitly while the param tree must stay byte-identical to the
    `LayerNorm` module's (checkpoints and importers address `ln_1/scale`).
    """

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Creates nn.Dense's exact param tree and returns the raw arrays."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (in_dim, self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return kernel, bias


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Plain XLA attention: [B, N, H, Dh] inputs, fp32 softmax.

    `valid_len` masks key positions >= valid_len (pad-once sequences).
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    n, m = logits.shape[-2], logits.shape[-1]
    neg = jnp.finfo(jnp.float32).min
    if causal:
        mask = jnp.tril(jnp.ones((n, m), dtype=bool))
        logits = jnp.where(mask, logits, neg)
    if valid_len is not None and valid_len < m:
        col = jnp.arange(m) < valid_len
        logits = jnp.where(col[None, None, None, :], logits, neg)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", weights, v)


def _flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Pallas TPU flash attention. Inputs [B, N, H, Dh]."""
    from denseclip_vit_multimodal_tpu.ops.attention import flash_attention

    return flash_attention(q, k, v, causal=causal, valid_len=valid_len)


def _ring_attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool,
    valid_len: Optional[int] = None,
) -> Optional[jnp.ndarray]:
    """Sequence-parallel ring attention (`attn_impl: ring`), or None when the
    shape/session can't ride the ring (caller falls back to the exact
    single-device impls).

    Shards the SEQUENCE over a mesh axis — `parallel.ring_attention.ring_mesh`
    pins one, else a 1-D ring over all visible devices — with K/V shards
    rotated by `ppermute` (SURVEY.md §5.7 long-context stretch; the reference
    holds full [N, N] scores on one device, models.py:311-344).  Sequences are
    padded to the ring size and masked via `valid_len`, so results are exact.
    """
    if causal or q.shape[1] != k.shape[1]:
        return None  # ring is wired for the ViT's non-causal self-attention
    from denseclip_vit_multimodal_tpu.parallel.ring_attention import (
        current_ring_mesh,
        ring_attention,
    )

    ctx = current_ring_mesh()
    if ctx is None:
        return None
    mesh, axis = ctx
    size = mesh.shape[axis]
    n = q.shape[1]
    n_pad = -(-n // size) * size
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        if valid_len is None:
            valid_len = n
    out = ring_attention(q, k, v, mesh, axis_name=axis, valid_len=valid_len)
    return out[:, :n]


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    impl: str = ATTN_AUTO,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Dispatch to the configured attention implementation."""
    if impl == ATTN_RING:
        out = _ring_attention_core(q, k, v, causal, valid_len)
        if out is not None:
            return out
        impl = ATTN_AUTO
    if impl == ATTN_INT8:
        # quantization lives in the fused-qkv path; when attention reaches
        # this core (CPU, cross-attention, unsupported shape) fall back to
        # the exact impls
        impl = ATTN_AUTO
    if impl == ATTN_FLASH:
        # explicit `attn_impl: flash` degrades off-TPU like int8/ring do —
        # pallas_call has no CPU path outside interpret mode
        from denseclip_vit_multimodal_tpu.ops.attention import _on_tpu

        if not _on_tpu():
            impl = ATTN_AUTO
    if impl == ATTN_AUTO:
        from denseclip_vit_multimodal_tpu.ops.attention import flash_supported

        impl = ATTN_FLASH if flash_supported(q) else ATTN_XLA
    if impl == ATTN_FLASH:
        return _flash_attention(q, k, v, causal, valid_len)
    return _xla_attention(q, k, v, causal, valid_len)


class MultiHeadAttention(nn.Module):
    """CLIP-style multi-head self/cross attention with fused QKV.

    Parameter layout (importer target, see train/clip_import.py):
      qkv/kernel [D, 3D], qkv/bias [3D]  <- torch in_proj_weight.T / in_proj_bias
      out/kernel [D, D],  out/bias [D]   <- torch out_proj

    `use_qkv_bias=False` reproduces the reference's einsum `Attention`
    (models.py:311-344) used in the ContextDecoder, which has separate
    unbiased q/k/v projections; we still fuse them into one matmul for
    self-attention and a [D, 2D] kv matmul for cross-attention.
    """

    num_heads: int
    causal: bool = False
    use_qkv_bias: bool = True
    attn_impl: str = ATTN_AUTO
    dtype: Dtype = jnp.float32

    def _qkv_kernel_applicable(self, qkv: jnp.ndarray, dim: int) -> bool:
        if self.attn_impl in (ATTN_XLA, ATTN_RING):
            return False
        from denseclip_vit_multimodal_tpu.ops.attention import (
            _FLASH_MIN_SEQ,
            _ONESHOT_MAX_SEQ,
            _on_tpu,
        )
        from denseclip_vit_multimodal_tpu.ops.mha_kernel import qkv_supported

        n = qkv.shape[1]
        if self.attn_impl == ATTN_AUTO and not (
            _on_tpu() and _FLASH_MIN_SEQ <= n <= _ONESHOT_MAX_SEQ
        ):
            return False
        if self.attn_impl in (ATTN_FLASH, ATTN_INT8) and not (
            _on_tpu() and n <= _ONESHOT_MAX_SEQ
        ):
            return False
        return qkv_supported(self.num_heads, dim)

    def _lnqkv_applicable(self, x: jnp.ndarray, dim: int) -> bool:
        """Fused LN+QKV+attention path (inference): same regime as the
        qkv-direct kernel.

        Default OFF: measured on v5e at the slide shape the fusion LOSES
        ~7% end to end (21.1 vs 22.7 img/s) — the per-lane-block LN
        recompute plus Mosaic's in-kernel projection scheduling cost more
        than the saved qkv HBM round trip.  Kept opt-in
        (DENSECLIP_FUSED_LNQKV=1) with full tests for future hardware.
        """
        if os.environ.get("DENSECLIP_FUSED_LNQKV", "0") != "1":
            return False
        if self.causal or self.use_qkv_bias is False:
            return False
        from denseclip_vit_multimodal_tpu.ops.lnqkv_kernel import (
            lnqkv_supported,
        )

        return self._qkv_kernel_applicable(x, dim) and lnqkv_supported(
            self.num_heads, dim, n=x.shape[1]
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kv: Optional[jnp.ndarray] = None,
        valid_len: Optional[int] = None,
        pre_ln: Optional[Tuple[jnp.ndarray, jnp.ndarray, float]] = None,
    ) -> jnp.ndarray:
        """Self/cross attention.  `pre_ln=(scale, bias, eps)` hands the
        preceding LayerNorm's affine params in UNAPPLIED so the fused
        LN+QKV+attention kernel can keep the normalized activations and the
        qkv tensor on-chip (ops/lnqkv_kernel.py); when the kernel does not
        serve this shape the norm is applied here and the standard path
        runs.  The param tree is identical either way.
        """
        dim = x.shape[-1]
        assert dim % self.num_heads == 0, (dim, self.num_heads)
        head_dim = dim // self.num_heads
        dense = functools.partial(
            nn.Dense,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
        )

        if pre_ln is not None and kv is None:
            ln_scale, ln_bias, ln_eps = pre_ln
            if self._lnqkv_applicable(x, dim):
                from denseclip_vit_multimodal_tpu.ops.lnqkv_kernel import (
                    ln_qkv_attention,
                )

                w_qkv, b_qkv = _DenseParams(3 * dim, name="qkv")(dim)
                out = ln_qkv_attention(
                    x.astype(self.dtype),
                    ln_scale,
                    ln_bias,
                    w_qkv,
                    b_qkv,
                    self.num_heads,
                    eps=ln_eps,
                    valid_len=valid_len,
                )
                return dense(dim, use_bias=True, name="out")(out)
            x = layer_norm_apply(x, ln_scale, ln_bias, ln_eps).astype(
                self.dtype
            )

        if kv is None:
            qkv = dense(3 * dim, use_bias=self.use_qkv_bias, name="qkv")(x)
            # Offload seam for selective remat (`tpu.remat: attn_qkv`): the
            # Pallas attention backward's residual is this projection; saving
            # it elides the LN + qkv-matmul recompute in the bwd pass.  A
            # no-op unless a save_only_these_names policy is active.
            qkv = checkpoint_name(qkv, "qkv_proj")
            if not self.causal and self._qkv_kernel_applicable(qkv, dim):
                # Fast path: attention straight off the fused projection —
                # no head split / transpose (ops/mha_kernel.py).  The int8
                # impl is the opt-in quantized serving path.
                from denseclip_vit_multimodal_tpu.ops.mha_kernel import (
                    mha_qkv_attention,
                    mha_qkv_attention_int8,
                )

                attn_fn = (
                    mha_qkv_attention_int8
                    if self.attn_impl == ATTN_INT8
                    else mha_qkv_attention
                )
                out = attn_fn(qkv, self.num_heads, valid_len=valid_len)
                return dense(dim, use_bias=True, name="out")(out)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(dim, use_bias=self.use_qkv_bias, name="q")(x)
            kv_proj = dense(2 * dim, use_bias=self.use_qkv_bias, name="kv")(kv)
            k, v = jnp.split(kv_proj, 2, axis=-1)

        b, n = q.shape[0], q.shape[1]
        m = k.shape[1]
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, m, self.num_heads, head_dim)
        v = v.reshape(b, m, self.num_heads, head_dim)

        out = attention_core(
            q, k, v, causal=self.causal, impl=self.attn_impl,
            valid_len=valid_len if kv is None else None,
        )
        out = out.reshape(b, n, dim)
        return dense(dim, use_bias=True, name="out")(out)


class MLP(nn.Module):
    """Transformer MLP: c_fc -> activation -> c_proj (reference models.py:277-281)."""

    hidden_mult: int = 4
    activation: Callable = quick_gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        h = nn.Dense(
            self.hidden_mult * dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="c_fc",
        )(x)
        h = self.activation(h)
        return nn.Dense(
            dim, dtype=self.dtype, param_dtype=jnp.float32, name="c_proj"
        )(h)


def drop_path(
    x: jnp.ndarray,
    rate: jnp.ndarray,
    deterministic: bool,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    """Per-sample stochastic depth (reference models.py:257-268).

    `rate` may be a traced scalar (per-layer rates ride through `nn.scan`).
    """
    if deterministic or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape=shape)
    inv_keep = (1.0 / jnp.maximum(keep, 1e-8)).astype(x.dtype)
    return jnp.where(mask, x * inv_keep, jnp.zeros_like(x))


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (reference models.py:271-294)."""

    num_heads: int
    causal: bool = False
    attn_impl: str = ATTN_AUTO
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        drop_path_rate: jnp.ndarray | float = 0.0,
        deterministic: bool = True,
        valid_len: Optional[int] = None,
    ) -> jnp.ndarray:
        rng1 = rng2 = None
        if not deterministic and self.has_rng("dropout"):
            rng1 = self.make_rng("dropout")
            rng2 = self.make_rng("dropout")
        attn = MultiHeadAttention(
            num_heads=self.num_heads,
            causal=self.causal,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="attn",
        )
        if deterministic and not self.causal:
            # Inference: hand ln_1's params to the attention module unapplied
            # so the fused LN+QKV+attention kernel can serve the whole chain
            # (training keeps the unfused path — its Pallas VJP is faster
            # than the fused op's XLA-reference backward).
            ln_scale, ln_bias = _LNParams(name="ln_1")(x.shape[-1])
            attn_out = attn(x, valid_len=valid_len, pre_ln=(ln_scale, ln_bias, 1e-5))
        else:
            attn_out = attn(
                LayerNorm(name="ln_1")(x).astype(self.dtype),
                valid_len=valid_len,
            )
        # Selective-remat seam (`tpu.remat: attn`): saving the attention
        # output elides the forward attention kernel from the backward
        # pass's recompute — the single most expensive recomputed op.
        attn_out = checkpoint_name(attn_out, "attn_out")
        x = x + drop_path(attn_out, drop_path_rate, deterministic, rng1)
        mlp_out = MLP(dtype=self.dtype, name="mlp")(
            LayerNorm(name="ln_2")(x).astype(self.dtype)
        )
        x = x + drop_path(mlp_out, drop_path_rate, deterministic, rng2)
        return x


def resolve_remat_policy(remat):
    """Map the `tpu.remat` config value to (active, jax.checkpoint policy).

    - false            -> no remat (save every residual)
    - true / "full"    -> blanket remat (recompute the whole block)
    - "attn"           -> save only the attention outputs: the bwd replay
                          skips the forward attention kernel — the single
                          most expensive recomputed op — for ~N*W bf16 per
                          layer of memory (ViT-L b8 @ 2593 tokens: 42 MB)
    - "attn_qkv"       -> additionally save the qkv projections (the Pallas
                          backward's residual): elides the LN+qkv-matmul
                          recompute too, for 3x the activation memory
    - "dots"           -> jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                          (save every weight-matmul output; recompute only
                          elementwise chains)
    """
    if not remat:
        return False, None
    if remat is True or remat == "full":
        return True, None
    policies = jax.checkpoint_policies
    if remat == "attn":
        return True, policies.save_only_these_names("attn_out")
    if remat == "attn_qkv":
        return True, policies.save_only_these_names("attn_out", "qkv_proj")
    if remat == "dots":
        return True, policies.dots_with_no_batch_dims_saveable
    raise ValueError(
        f"Unsupported remat mode {remat!r}: expected false, true/'full', "
        "'attn', 'attn_qkv', or 'dots'"
    )


class Transformer(nn.Module):
    """Scan-compiled stack of residual attention blocks.

    Returns `(final, taps)` where `taps` is `[layers, B, N, D]` containing the
    output of every block — the ViT backbone selects its `out_indices` from
    this for free.  Single-pass semantics (the reference double-applies its
    stack, models.py:305-307 — a bug we do not reproduce; divergence is
    documented in SURVEY.md §7).
    """

    width: int
    layers: int
    heads: int
    causal: bool = False
    drop_path_rate: float = 0.0
    attn_impl: str = ATTN_AUTO
    dtype: Dtype = jnp.float32
    remat: Any = False  # false | true/"full" | "attn" | "attn_qkv" | "dots"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        valid_len: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # Linear stochastic-depth decay over layers (reference models.py:302).
        rates = jnp.linspace(0.0, self.drop_path_rate, self.layers)
        num_heads = self.heads
        causal = self.causal
        attn_impl = self.attn_impl
        dtype = self.dtype
        remat = self.remat

        class TapBlock(nn.Module):
            """One scanned step: run the block, emit its output as a tap."""

            @nn.compact
            def __call__(self, carry, rate):
                block_cls = ResidualAttentionBlock
                remat_on, remat_policy = resolve_remat_policy(remat)
                if remat_on:
                    block_cls = nn.remat(
                        block_cls, static_argnums=(3, 4), policy=remat_policy
                    )
                y = block_cls(
                    num_heads=num_heads,
                    causal=causal,
                    attn_impl=attn_impl,
                    dtype=dtype,
                    name="block",
                )(carry, rate, deterministic, valid_len)
                return y, y

        # Opt-in pipeline parallelism: when a `pipe` mesh axis is active
        # (parallel/pipeline.py) and the shapes divide, run the SAME scanned
        # params as a GPipe pipeline — stages hold L/S contiguous blocks,
        # activations hop stages via ppermute.  Gated to the non-causal
        # (vision) stack: the text towers are tiny and their batch is the
        # class count, which need not divide the microbatch count.
        if not self.is_initializing() and not causal:
            from denseclip_vit_multimodal_tpu.parallel.pipeline import (
                current_pipeline,
                pipeline_blocks,
            )

            pctx = current_pipeline()
            if pctx is not None and self.has_variable("params", "blocks"):
                micro = pctx.microbatches or pctx.stages
                blockers = []
                if self.layers % pctx.stages:
                    blockers.append(
                        f"{self.layers} layers % {pctx.stages} stages != 0"
                    )
                if x.shape[0] % micro:
                    blockers.append(
                        f"batch {x.shape[0]} % {micro} microbatches != 0"
                    )
                if blockers:
                    # Falling back to the replicated scan burns stages x
                    # redundant compute with no other signal — say so once
                    # per offending shape (trace-time, so cheap).
                    import warnings

                    key = (self.layers, x.shape[0], pctx.stages, micro)
                    if key not in _PIPELINE_FALLBACK_WARNED:
                        _PIPELINE_FALLBACK_WARNED.add(key)
                        warnings.warn(
                            "pipeline parallelism requested but this "
                            f"transformer stack falls back to the plain "
                            f"scan ({'; '.join(blockers)}) — it runs "
                            "REPLICATED over the pipe axis",
                            stacklevel=2,
                        )
                    pctx = None
            else:
                pctx = None
            if pctx is not None:
                stacked = self.get_variable("params", "blocks")["block"]
                block = ResidualAttentionBlock(
                    num_heads=num_heads,
                    causal=causal,
                    attn_impl=attn_impl,
                    dtype=dtype,
                )
                keys = None
                if not deterministic and self.has_rng("dropout"):
                    # Per-layer dropout keys ride the pipeline as scanned
                    # inputs; the microbatch index is folded in per tick so
                    # masks differ across microbatches (stream differs from
                    # nn.scan's split — both are valid iid draws;
                    # equivalence tests run deterministic).
                    keys = jax.random.split(
                        self.make_rng("dropout"), self.layers
                    )

                def block_apply(p, h, aux, mb_idx):
                    rate = aux[0] if keys is not None else aux
                    rngs = None
                    if keys is not None:
                        rngs = {"dropout": jax.random.fold_in(aux[1], mb_idx)}

                    def fn(pp, hh):
                        return block.apply(
                            {"params": pp},
                            hh,
                            rate,
                            deterministic,
                            valid_len,
                            rngs=rngs,
                        )

                    remat_on, remat_policy = resolve_remat_policy(remat)
                    if remat_on:
                        fn = jax.checkpoint(fn, policy=remat_policy)
                    return fn(p, h)

                aux = rates if keys is None else (rates, keys)
                taps = pipeline_blocks(
                    block_apply,
                    stacked,
                    x,
                    aux,
                    pctx.mesh,
                    axis=pctx.axis,
                    microbatches=pctx.microbatches,
                )
                return taps[-1], taps

        # Unrolling lets XLA software-pipeline HBM traffic across layer
        # boundaries at the cost of compile time; env-gated for measurement.
        unroll = int(os.environ.get("DENSECLIP_SCAN_UNROLL", "1"))
        if unroll <= 1 or self.layers % unroll:
            unroll = 1
        Scanned = nn.scan(
            TapBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0,),
            length=self.layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
            unroll=unroll,
        )
        final, taps = Scanned(name="blocks")(x, rates)
        return final, taps


class ConvBNReLU(nn.Module):
    """Conv(bias=False) + BatchNorm + ReLU in NHWC (reference models.py:13-20).

    Under pjit with a batch-sharded mesh the batch statistics are global by
    construction (XLA inserts the cross-device reductions), i.e. this is
    effectively SyncBN — stronger than the reference's per-GPU BN.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


def resize_bilinear(
    x: jnp.ndarray, size: Tuple[int, int], antialias: bool = False
) -> jnp.ndarray:
    """Bilinear resize on NHWC (or [H, W, C]) matching torch align_corners=False.

    `jax.image.resize(method='bilinear')` uses half-pixel centers, the same
    convention as `F.interpolate(..., align_corners=False)` used throughout
    the reference (e.g. denseclip.py:847, models.py:489).
    """
    if x.ndim == 4:
        shape = (x.shape[0], size[0], size[1], x.shape[3])
    elif x.ndim == 3:
        shape = (size[0], size[1], x.shape[2])
    else:
        raise ValueError(f"resize_bilinear expects 3D/4D NHWC input, got {x.shape}")
    return jax.image.resize(x, shape, method="bilinear", antialias=antialias).astype(
        x.dtype
    )
