#!/usr/bin/env python
"""TPU self-test: kernel correctness + dispatch sanity on the real device.

CPU tests exercise the Pallas kernels in interpret mode only; Mosaic (the
real TPU lowering) enforces tiling rules the interpreter doesn't and computes
in bf16.  This tool runs the exactness checks on the actual backend and
prints PASS/FAIL per check — run it after touching ops/.

    python tools/tpu_selftest.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from denseclip_vit_multimodal_tpu.ops.attention import (
        flash_attention,
        flash_supported,
    )
    from denseclip_vit_multimodal_tpu.ops.mha_kernel import (
        mha_attention,
        mha_qkv_attention,
    )

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})")
    failures = 0

    def check(name, got, want, tol):
        nonlocal failures
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        ok = err <= tol
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: max_err={err:.5f} (tol {tol})")

    def xla_attn(q, k, v, valid_len=None):
        d = q.shape[-1]
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * (d**-0.5)
        if valid_len is not None:
            col = jnp.arange(s.shape[-1]) < valid_len
            s = jnp.where(col[None, None, None, :], s, jnp.finfo(jnp.float32).min)
        w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", w, v)

    # fp32 tolerance 5e-3, not 1e-3: the TPU MXU runs fp32 matmuls at
    # DEFAULT (bf16-pass) precision, and the kernel's operand-folded scale /
    # deferred division reorder rounding vs the XLA reference.  Bit-level
    # fp32 exactness is covered by the CPU interpret-mode tests.
    for n, dtype, tol in ((1601, jnp.bfloat16, 2e-2), (1024, jnp.float32, 5e-3)):
        shape = (2, n, 12, 64)
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(n), 3)
        q = jax.random.normal(kq, shape, dtype)
        k = jax.random.normal(kk, shape, dtype)
        v = jax.random.normal(kv, shape, dtype)
        ref = xla_attn(q, k, v)
        check(f"one-shot kernel N={n} {dtype.__name__}",
              mha_attention(q, k, v), ref, tol)
        qkv = jnp.concatenate(
            [x.reshape(2, n, -1) for x in (q, k, v)], axis=-1
        )
        check(f"qkv-direct kernel N={n} {dtype.__name__}",
              mha_qkv_attention(qkv, 12).reshape(shape), ref, tol)

    # valid_len masking on a pre-padded sequence
    n, pad_n = 1500, 1536
    shape = (1, n, 4, 64)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    padded = lambda x: jnp.pad(x, ((0, 0), (0, pad_n - n), (0, 0), (0, 0)))
    ref = xla_attn(q, k, v)
    got = mha_attention(padded(q), padded(k), padded(v), valid_len=n)[:, :n]
    check("valid_len masking (pad 1500->1536)", got, ref, 2e-2)

    # opt-in int8 path (quantization budget, not bit-exact)
    from denseclip_vit_multimodal_tpu.ops.mha_kernel import (
        mha_qkv_attention_int8,
    )

    n = 1601
    shape = (2, n, 12, 64)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    ref = xla_attn(q, k, v)
    qkv = jnp.concatenate([x.reshape(2, n, -1) for x in (q, k, v)], axis=-1)
    check("int8 kernel N=1601 (quantized, tol 0.35)",
          mha_qkv_attention_int8(qkv, 12).reshape(shape), ref, 0.35)

    # long-sequence bundled flash path (whole-frame sizes)
    n = 8193
    shape = (1, n, 4, 64)
    q = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(3), shape, jnp.bfloat16)
    if flash_supported(q):
        ref = xla_attn(q, k, v)
        check("bundled flash N=8193", flash_attention(q, k, v), ref, 3e-2)
    else:
        print(f"SKIP bundled flash (unsupported on {backend})")

    print("SELFTEST", "FAILED" if failures else "OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
