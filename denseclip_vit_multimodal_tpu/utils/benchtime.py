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
  * fetch ONE scalar at the end;
  * repeat the timed run until the two fastest agree within 2% (relay
    sessions drift +-15%, and a fresh session's first timed runs read up
    to ~15% low — docs/PERFORMANCE.md "Measurement lesson") and report
    the min, plus the observed spread so recorded results carry their
    own noise bound.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Tuple


def adaptive_min_time(
    run_once: Callable[[], None],
    max_rounds: int = 6,
    rel_tol: float = 0.02,
) -> Tuple[float, float]:
    """Repeat `run_once` until its two fastest timings agree within
    `rel_tol`; returns (best_seconds, drift_pct).

    `drift_pct` = spread of ALL observed runs around the best
    ((max-min)/min*100) — the session-noise bound to record next to the
    measurement.  Used by bench.py and tools/bench_suite.py so
    round-over-round suite comparisons aren't single-shot noise samples
    (r4 VERDICT weak #7: loader rows halved between rounds from recorded
    one-shot variance)."""
    times: List[float] = []
    for _ in range(max_rounds):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
        if len(times) >= 2:
            best, second = sorted(times)[:2]
            if second - best < rel_tol * best:
                break
    best = min(times)
    drift = (max(times) - best) / best * 100.0
    return best, drift


def device_loop_time(fn, args, iters: int,
                     stats: Optional[dict] = None) -> float:
    """Seconds per iteration of fn(*args), looped on device.

    Adaptive: the `iters`-long device loop is re-run until the two fastest
    wall times agree within 2% (max 6 runs); returns min/iters.  Pass a
    dict as `stats` to receive {'runs': n, 'drift_pct': spread}."""
    import jax
    import jax.numpy as jnp

    def fold(leaf):
        # Pin every LEADING-dim (batch) element and every channel: a
        # flat[0]-style read covered only batch 0's first pixel, which
        # left batch>1 workloads legally narrowable to one frame (the
        # r3 carry-pinning lesson, batch edition).  First + last dim-1
        # plane per batch element is ~1e-3 of a canvas — carry cost nil
        # (r3 measured a FULL-canvas sum timing the same as two corners).
        if leaf.ndim >= 3:
            return (jnp.sum(leaf[:, 0].astype(jnp.float32))
                    + jnp.sum(leaf[:, -1].astype(jnp.float32)))
        return jnp.sum(leaf.astype(jnp.float32))

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
    n_runs = [0]

    def run_once():
        float(loop(args, iters))
        n_runs[0] += 1

    best, drift = adaptive_min_time(run_once)
    if stats is not None:
        stats["runs"] = n_runs[0]
        stats["drift_pct"] = round(drift, 2)
    return best / iters
