"""Shared device-loop timing helper for benchmarks.

One canonical implementation of the methodology CLAUDE.md mandates for
relay-attached TPU sessions (tools/bench_suite.py, tools/profile_attn.py):

  * loop ON DEVICE (`lax.fori_loop`) — per-dispatch RPC latency (~30 ms)
    and an unreliable `block_until_ready` make host loops meaningless;
  * perturb every floating input with a carry-dependent epsilon so
    iterations serialize and loop-invariant hoisting can't lift the body;
  * fold one full minor-axis row of EVERY output leaf into the carry — a
    first-leaf-only or single-element carry lets XLA dead-code-eliminate
    whole branches (a depth head when only seg is folded) or narrow the
    channel dimension through elementwise chains (measured ~5% inflation
    of the slide headline when only logit channel 0 was read);
  * fetch ONE scalar at the end.
"""

from __future__ import annotations

import time


def device_loop_time(fn, args, iters: int) -> float:
    """Seconds per iteration of fn(*args), looped on device."""
    import jax
    import jax.numpy as jnp

    def fold(leaf):
        # one element of every minor-axis (channel) entry: pins the whole
        # channel dim without a canvas-wide reduction
        flat = jnp.reshape(leaf, (-1, leaf.shape[-1])) if leaf.ndim >= 1 \
            else jnp.reshape(leaf, (1, 1))
        return jnp.sum(flat[0].astype(jnp.float32))

    @jax.jit
    def loop(args, iters):
        def body(i, acc):
            out = fn(*jax.tree.map(
                lambda x: x + (acc * 1e-20).astype(x.dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                args,
            ))
            return acc + sum(fold(leaf) for leaf in jax.tree.leaves(out))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(args, 1))  # compile + warmup
    t0 = time.perf_counter()
    float(loop(args, iters))
    return (time.perf_counter() - t0) / iters
