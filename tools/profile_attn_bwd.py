#!/usr/bin/env python
"""Backward attention-kernel microbenchmarks at training shapes.

Times the shipped Pallas backward (ops/mha_kernel.py::_bwd_kernel) against
the XLA autodiff-of-reference backward, at the heritage-train shape
(640x640 crop -> N=1601, batch 8, 12 heads) or any --batch/--seq, using the
device-loop methodology bench.py mandates for relay-attached sessions.

History (v5e, bf16, b8/h12/N1601): the round-2 backward paid three full
[bq, N] VPU passes the forward had already eliminated (scale multiply, pad
mask, softmax division); folding them out the same way measured
4.066 -> 3.769 ms (-7.3%) and is now the shipped kernel.

    python tools/profile_attn_bwd.py [--batch 8] [--seq 1601]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from denseclip_vit_multimodal_tpu.utils.benchtime import device_loop_time  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=1601)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--head-dim", type=int, default=64)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--out", default="profile_attn_bwd_results.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from denseclip_vit_multimodal_tpu.ops.mha_kernel import (
        _mha_bwd_pallas,
        _mha_fwd_impl,
        _xla_reference,
    )

    b, n, h, d = args.batch, args.seq, args.heads, args.head_dim
    scale = d ** -0.5
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(
        rng.randn(b, h, n, d).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v, do = mk(), mk(), mk(), mk()

    results = {}

    def bench(name, fn, fargs):
        dt = device_loop_time(fn, fargs, args.iters)
        results[name] = dt * 1e3
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 4)}),
              flush=True)

    def xla_bwd(qq, kk, vv, dd):
        flat = lambda x: x.reshape(b * h, n, d)
        _, vjp = jax.vjp(
            lambda a, bb2, c: _xla_reference(a, bb2, c, scale),
            flat(qq), flat(kk), flat(vv),
        )
        return vjp(flat(dd))

    # numeric agreement (bf16 noise tolerance; exact same math up to assoc)
    ref = jax.tree.map(lambda x: x.reshape(b, h, n, d).astype(jnp.float32),
                       xla_bwd(q, k, v, do))
    got = _mha_bwd_pallas(q, k, v, do, scale, 0, False, None)
    for name, a, bb in zip("dq dk dv".split(), ref, got):
        err = float(jnp.max(jnp.abs(a - bb)) / (jnp.max(jnp.abs(a)) + 1e-9))
        print(json.dumps({"agreement_vs_xla": name, "rel_err": err}),
              flush=True)
        results[f"relerr_{name}"] = err

    bench("fwd_kernel", lambda *xs: _mha_fwd_impl(*xs, scale, 0, False),
          (q, k, v))
    bench("bwd_pallas",
          lambda *xs: _mha_bwd_pallas(*xs, scale, 0, False, None),
          (q, k, v, do))
    bench("bwd_xla_recompute", xla_bwd, (q, k, v, do))

    with open(args.out, "w") as f:
        json.dump({"shape": [b, h, n, d],
                   **{k2: round(v2, 5) for k2, v2 in results.items()}},
                  f, indent=1)
    print(json.dumps({"all_ms": {k2: round(v2, 4) for k2, v2
                                 in results.items()}}))


if __name__ == "__main__":
    main()
