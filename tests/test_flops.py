"""FLOP accounting: the cost-analysis blind spot and its correction.

The MFU anchor in bench.py / tools/get_flops.py rests on two claims
(utils/flops.py): XLA's cost model charges a scan body once, and the
analytic make-up term has the right shape.  Both are pinned here.
"""

import jax
import jax.numpy as jnp

from denseclip_vit_multimodal_tpu.utils.flops import (
    vit_backbone_flop_correction,
    vit_layer_attn_flops,
    vit_layer_dense_flops,
)


def _flops(fn, *args):
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})
    return float(cost.get("flops", float("nan")))


def test_cost_analysis_counts_scan_body_once():
    """Premise: a lax.scan of L matmuls reports ~one matmul of flops.

    (Verified on the TPU backend too: a 4-iteration fori_loop over a
    1024^3 matmul reported 2.15 GF, not 8.6 GF.)
    """
    x = jnp.zeros((256, 256), jnp.float32)
    w = jnp.zeros((256, 256), jnp.float32)

    one = _flops(lambda a, b: a @ b, x, w)

    def scanned(a, b):
        return jax.lax.scan(lambda c, _: (c @ b, None), a, None, length=8)[0]

    eight = _flops(scanned, x, w)
    assert one > 0
    # the body is charged once (small epsilon for scan bookkeeping ops)
    assert eight < 2 * one, (one, eight)


def test_vit_correction_formula():
    # ViT-B/16 at the bench slide shape: 10 windows x 1601 tokens.
    layers, width, batch, n = 12, 768, 10, 1601
    t = batch * n
    dense = 24 * t * width * width
    attn = 4 * batch * n * n * width
    assert vit_layer_dense_flops(t, width) == dense
    assert vit_layer_attn_flops(batch, n, width) == attn
    # Pallas path: dense counted once already, attention never.
    assert vit_backbone_flop_correction(
        layers, width, batch, n, attn_counted=False
    ) == (layers - 1) * dense + layers * attn
    # XLA-attention path: the single counted body included attention.
    assert vit_backbone_flop_correction(
        layers, width, batch, n, attn_counted=True
    ) == (layers - 1) * (dense + attn)


def test_corrected_total_scales_with_depth():
    """Corrected totals must scale ~linearly in depth even though the raw
    cost-analysis number barely moves (the blind spot itself)."""
    width, batch, n = 64, 2, 65
    totals = {}
    for layers in (2, 4):
        raw = vit_layer_dense_flops(batch * n, width) + vit_layer_attn_flops(
            batch, n, width
        )  # what cost analysis would report: one body
        totals[layers] = raw + vit_backbone_flop_correction(
            layers, width, batch, n, attn_counted=True
        )
    assert abs(totals[4] / totals[2] - 2.0) < 1e-9


def test_attention_counted_mirrors_dispatch(monkeypatch):
    """attention_counted_by_cost_analysis must key on the ACTUAL attention
    dispatch (models/layers.py), not the device platform: xla/ring impls
    and out-of-range token counts run XLA attention ON TPU, where the
    Pallas make-up term would overstate FLOPs by one layer of attention
    (round-4 review finding)."""
    from denseclip_vit_multimodal_tpu.ops import attention as attn_mod
    from denseclip_vit_multimodal_tpu.utils.flops import (
        attention_counted_by_cost_analysis as counted,
    )

    # Off-TPU every path lowers to XLA einsums -> counted.
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: False)
    assert counted("auto", 1522, 12, 64)

    # Pretend-TPU: mirror the dispatch table.
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    # explicit XLA / ring (shard_map'd einsums) -> counted even on TPU
    assert counted("xla", 1522, 12, 64)
    assert counted("ring", 1522, 12, 64)
    # the ViT-B slide window (1522 tokens, 12 heads, d=64): one-shot
    # Pallas kernel -> NOT counted
    assert not counted("auto", 1522, 12, 64)
    # whole-frame 8193 tokens: within the one-shot range (8448) -> Pallas
    assert not counted("auto", 8193, 12, 64)
    # beyond the one-shot range under auto: bundled flash (still Pallas,
    # d=64 supported, n >= flash min) -> NOT counted
    assert not counted("auto", 9000, 12, 64)
    # tiny sequences under auto (below the flash minimum): XLA -> counted
    assert counted("auto", 197, 12, 64)
    # unsupported head_dim falls through every Pallas path -> counted
    assert counted("auto", 1522, 12, 48)
