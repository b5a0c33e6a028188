"""Environment reporting, determinism knobs, and profiling hooks.

Covers the reference's `collect_env_info` (reference:
segmentation/denseclip/utils.py:142-184), `set_random_seed` +
`--deterministic` (utils.py:51-59), and — going beyond the reference, which
has no profiling at all (SURVEY.md §5.1) — first-class `jax.profiler` trace
capture and per-step timing.
"""

from __future__ import annotations

import contextlib
import platform
import sys
import time
from typing import Iterator, Optional


def collect_env_info() -> str:
    """Human-readable environment report."""
    import jax

    lines = [
        f"python              : {sys.version.split()[0]} ({platform.platform()})",
        f"jax                 : {jax.__version__}",
        f"backend             : {jax.default_backend()}",
        f"devices             : {[str(d) for d in jax.devices()]}",
        f"process             : {jax.process_index()}/{jax.process_count()}",
    ]
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            import importlib

            m = importlib.import_module(mod)
            lines.append(f"{mod:<20}: {getattr(m, '__version__', '?')}")
        except ImportError:
            lines.append(f"{mod:<20}: not installed")
    return "\n".join(lines)


def apply_tpu_options(tpu_cfg) -> None:
    """Session-level JAX options from the config's `tpu:` section.

    `tpu.compilation_cache: <dir>` turns on JAX's persistent compilation
    cache: jit artifacts are written to disk and reused across process
    restarts, cutting the 20-40 s cold compile of the full model when an
    eval/serving CLI is re-launched (no reference equivalent — torch eager
    has no compile step to cache).  Thresholds are zeroed so every program
    in the slide/aug-test family caches, not just the slowest ones.
    """
    get = tpu_cfg.get if hasattr(tpu_cfg, "get") else dict(tpu_cfg or {}).get
    cache_dir = get("compilation_cache", None)
    if cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # JAX's default 1 s minimum keeps trivial programs (and their
        # per-dispatch cache probes) out; `tpu.compilation_cache_min_secs: 0`
        # caches everything.
        min_secs = get("compilation_cache_min_secs", None)
        if min_secs is not None:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", float(min_secs)
            )
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # The cache singleton latches its directory at the first post-init
        # jit; if something already compiled (or an env var pre-seeded a
        # different dir), drop it so the configured dir takes effect.
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc,
        )

        _cc.reset_cache()


def set_determinism(matmul_precision: str = "highest") -> None:
    """XLA is deterministic by default; this pins matmul precision so runs
    are bit-reproducible across restarts (the TPU analog of the reference's
    cudnn.deterministic flag, utils.py:51-59)."""
    import jax

    jax.config.update("jax_default_matmul_precision", matmul_precision)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto).

    No-op when log_dir is falsy, so call sites can be left in place.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-time stats for throughput logging."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def steps_per_sec(self) -> float:
        return 1.0 / self.mean if self.mean else 0.0


def seed_everything(seed: int) -> "jax.Array":
    """Seed python/numpy and return a root JAX PRNG key.

    The reference seeds python/numpy/torch/cuda per rank
    (utils.py:51-59, train_denseclip.py:941 adds the rank); JAX randomness is
    carried explicitly by keys, so this returns the root key folded with the
    process index — per-process streams without global state.
    """
    import random

    import jax
    import numpy as np

    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.fold_in(jax.random.PRNGKey(seed), jax.process_index())


class GracefulShutdown:
    """SIGTERM-aware stop flag for preemption-safe training.

    TPU VMs receive SIGTERM on maintenance events / preemptions; the train
    loop polls `requested` each step and saves a resumable checkpoint before
    exiting (the reference's only recovery is a manual `--resume`,
    SURVEY.md §5.3).  A second SIGTERM falls through to the previous handler
    so a stuck save can still be killed.  `restore()` reinstalls the prior
    handler (important under pytest / nested loops).
    """

    def __init__(self, logger=None):
        import signal

        self.requested = False
        self._logger = logger
        self._signal = signal
        try:
            self._prev = signal.signal(signal.SIGTERM, self._handle)
            self._installed = True
        except ValueError:  # not in the main thread
            self._prev = None
            self._installed = False

    def _handle(self, signum, frame):
        if self.requested:
            # second SIGTERM: the save may be wedged — actually fall
            # through.  A callable previous handler runs directly; for
            # SIG_DFL/SIG_IGN/None (the common dispositions) reinstall the
            # default action and re-deliver so the process dies instead of
            # swallowing every subsequent SIGTERM.
            if callable(self._prev):
                self._prev(signum, frame)
            else:
                import os

                self._signal.signal(signum, self._signal.SIG_DFL)
                self._installed = False
                os.kill(os.getpid(), signum)
            return
        self.requested = True
        if self._logger is not None:
            self._logger.warning(
                "SIGTERM received: finishing the current step, then "
                "checkpointing and exiting"
            )

    def restore(self) -> None:
        if self._installed:
            self._signal.signal(
                self._signal.SIGTERM, self._prev or self._signal.SIG_DFL
            )
            self._installed = False
