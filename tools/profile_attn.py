#!/usr/bin/env python
"""Attention-path microbenchmarks at the slide-window shape.

Times each stage of the ViT residual block (LN, fused QKV projection, the
attention core, out projection, MLP) plus the whole block, at the
640x640-window shape the slide engine batches (N=1601 -> pad 1664, width
768, 12 heads, 10 windows per 1024x2048 frame).  Device-side fori_loop
timing (see bench.py methodology — host timing lies through the relay).

    python tools/profile_attn.py [--batch 10] [--seq 1601] [--width 768]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from denseclip_vit_multimodal_tpu.utils.benchtime import device_loop_time  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--seq", type=int, default=1601)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from denseclip_vit_multimodal_tpu.models.layers import (
        LayerNorm,
        MLP,
        MultiHeadAttention,
        ResidualAttentionBlock,
    )
    from denseclip_vit_multimodal_tpu.ops.mha_kernel import mha_qkv_attention

    b, n, d, h = args.batch, args.seq, args.width, args.heads
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32)).astype(jnp.bfloat16)
    qkv = jnp.asarray(rng.randn(b, n, 3 * d).astype(np.float32)).astype(jnp.bfloat16)

    results = {}

    def bench(name, fn, fargs, iters=None):
        dt = device_loop_time(fn, fargs, iters or args.iters)
        results[name] = dt * 1e3
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 4)}), flush=True)

    # whole residual block (bf16, auto attn impl)
    block = ResidualAttentionBlock(num_heads=h, dtype=jnp.bfloat16)
    bvars = block.init(jax.random.PRNGKey(0), x)
    bench("block_total", lambda v, xx: block.apply(v, xx), (bvars, x))

    # attention half only
    attn = MultiHeadAttention(num_heads=h, dtype=jnp.bfloat16)
    avars = attn.init(jax.random.PRNGKey(0), x)
    bench("attn_module", lambda v, xx: attn.apply(v, xx), (avars, x))

    # pieces
    ln = LayerNorm()
    lvars = ln.init(jax.random.PRNGKey(0), x)
    bench("ln_only", lambda v, xx: ln.apply(v, xx).astype(jnp.bfloat16), (lvars, x))

    wq = jnp.asarray(rng.randn(d, 3 * d).astype(np.float32)).astype(jnp.bfloat16)
    bench("qkv_matmul", lambda xx, ww: xx @ ww, (x, wq))

    bench("kernel_only", lambda qq: mha_qkv_attention(qq, h), (qkv,))

    wo = jnp.asarray(rng.randn(d, d).astype(np.float32)).astype(jnp.bfloat16)
    bench("out_matmul", lambda xx, ww: xx @ ww, (x, wo))

    mlp = MLP(dtype=jnp.bfloat16)
    mvars = mlp.init(jax.random.PRNGKey(0), x)
    bench("mlp_only", lambda v, xx: mlp.apply(v, xx), (mvars, x))

    with open("profile_attn_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"all_ms": {k: round(v, 4) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
