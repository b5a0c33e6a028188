"""GPipe-style pipeline parallelism over a `pipe` mesh axis.

The reference has no pipeline parallelism at all — its only scaling axis is
single-node data-parallel DDP (reference: segmentation/train_denseclip.py:1649-1661).
This module adds an opt-in TPU-native pipeline dimension for the transformer
block stack (SURVEY.md §2.8 stretch goals), the way the scaling playbook
prescribes: the scanned layer axis `[L, ...]` is sharded over a `pipe` mesh
axis, each stage runs its contiguous `L/S` blocks, and activations hop one
ICI step per tick via `lax.ppermute` under `jax.shard_map`.

Schedule: plain GPipe.  The batch is split into `M` microbatches; at tick
`t` stage `s` processes microbatch `t - s` (when `0 <= t - s < M`), so a
full pass takes `M + S - 1` ticks with an `(S-1)/(M+S-1)` bubble.  All
stages execute the same SPMD program; bubble ticks compute on garbage and
their writes are masked out.

Composition:
  * `shard_map(..., axis_names={'pipe'})` is manual over the pipe axis ONLY
    — the `data` (and `model`) axes stay under the automatic SPMD
    partitioner, so dp x pp (and tp x pp) compose without this module
    knowing about them.
  * The stacked block params stay bit-identical to the `nn.scan` layout
    (checkpoints are interchangeable between pipelined and non-pipelined
    runs); only their *placement* gains a leading-stage shard.
  * Differentiable end to end: `ppermute`'s transpose is the reverse
    permutation, so `jax.grad` through a pipelined stack implements the
    backward pipeline automatically.

Activation: config `tpu.pipeline: {stages: S, microbatches: M}` (see
`train/step.py` / `__graft_entry__.py`), or programmatically via
`activate_pipeline(mesh)` around tracing.  The `Transformer` module checks
`current_pipeline()` and reroutes its scanned stack through
`pipeline_blocks` when active.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"

_ACTIVE: contextvars.ContextVar[Optional["PipelineContext"]] = contextvars.ContextVar(
    "denseclip_pipeline", default=None
)


class PipelineContext:
    """Mesh + axis + microbatch count for an active pipeline region."""

    def __init__(
        self,
        mesh: Mesh,
        axis: str = PIPE_AXIS,
        microbatches: Optional[int] = None,
    ):
        if axis not in mesh.axis_names:
            raise ValueError(f"mesh {mesh.axis_names} has no '{axis}' axis")
        self.mesh = mesh
        self.axis = axis
        self.microbatches = microbatches

    @property
    def stages(self) -> int:
        return self.mesh.shape[self.axis]


def current_pipeline() -> Optional[PipelineContext]:
    """The active pipeline context, or None (single-stage execution)."""
    ctx = _ACTIVE.get()
    if ctx is not None and ctx.stages == 1:
        return None  # a 1-stage pipeline is just the plain scan
    return ctx


@contextlib.contextmanager
def activate_pipeline(
    mesh: Mesh, axis: str = PIPE_AXIS, microbatches: Optional[int] = None
):
    """Route transformer stacks through the pipeline while tracing inside."""
    token = _ACTIVE.set(PipelineContext(mesh, axis, microbatches))
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def _reshape_leading(tree: Any, s: int) -> Any:
    """[L, ...] leaves -> [S, L/S, ...]."""
    return jax.tree.map(
        lambda a: a.reshape((s, a.shape[0] // s) + a.shape[1:]), tree
    )


def pipeline_blocks(
    block_apply: Callable[[Any, jnp.ndarray, Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    per_layer: Any,
    mesh: Mesh,
    *,
    axis: str = PIPE_AXIS,
    microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """Apply a stacked block chain as a GPipe pipeline; returns all taps.

    Args:
      block_apply: ``(params_l, h, aux_l, microbatch_idx) -> h'`` — ONE
        block on one microbatch.  ``params_l`` / ``aux_l`` are layer-``l``
        slices of ``stacked_params`` / ``per_layer``; ``microbatch_idx`` is
        the traced index of the microbatch being processed (fold it into
        any rng keys so stochastic masks differ across microbatches).
      stacked_params: pytree whose leaves lead with the layer axis ``[L, ...]``
        (the `nn.scan` layout).
      x: the full batch ``[B, ...]``; split into microbatches internally.
      per_layer: pytree of per-layer scan inputs (drop-path rates, rng keys),
        leaves ``[L, ...]``.
      mesh: mesh holding the ``axis`` to pipeline over; other axes (data,
        model) remain under automatic partitioning.
      microbatches: ``M`` (default: the stage count ``S``).  ``B % M == 0``.

    Returns:
      taps ``[L, B, ...]`` — every block's output, identical in value and
      layout to the `nn.scan` taps (the final activation is ``taps[-1]``).
    """
    leaves = jax.tree.leaves(stacked_params)
    if not leaves:
        raise ValueError("pipeline_blocks: empty parameter tree")
    n_layers = leaves[0].shape[0]
    s = mesh.shape[axis]
    m = int(microbatches) if microbatches else s
    if n_layers % s:
        raise ValueError(f"{n_layers} layers not divisible by {s} pipeline stages")
    batch = x.shape[0]
    if batch % m:
        raise ValueError(f"batch {batch} not divisible by {m} microbatches")
    l_local = n_layers // s

    params_staged = _reshape_leading(stacked_params, s)
    aux_staged = _reshape_leading(per_layer, s)
    x_mb = x.reshape((m, batch // m) + x.shape[1:])

    def run(params_local, aux_local, x_all):
        # params_local/aux_local arrive as [1, L/S, ...] (shard_map keeps the
        # sharded stage dim at local extent 1); x_all: [M, b, ...]
        # microbatches, replicated over the pipe axis.
        params_local = jax.tree.map(lambda a: a[0], params_local)
        aux_local = jax.tree.map(lambda a: a[0], aux_local)
        stage_idx = jax.lax.axis_index(axis)

        def stage(h, mb_idx):
            def body(carry, inp):
                p_l, a_l = inp
                y = block_apply(p_l, carry, a_l, mb_idx)
                return y, y

            _, taps = jax.lax.scan(body, h, (params_local, aux_local))
            return taps  # [L/S, b, ...]

        zeros_state = jnp.zeros_like(x_all[0])
        # Make the initial carry "varying" over the pipe axis so it can ride
        # ppermute (x_all arrives replicated over pipe).
        zeros_state = jax.lax.pcast(zeros_state, (axis,), to='varying')
        taps0 = jnp.zeros((l_local, m) + x_all.shape[1:], x_all.dtype)
        taps0 = jax.lax.pcast(taps0, (axis,), to='varying')

        def tick(carry, t):
            state, taps_buf = carry
            # Stage 0 injects microbatch t (clamped during drain ticks).
            inject = jax.lax.dynamic_index_in_dim(
                x_all, jnp.clip(t, 0, m - 1), keepdims=False
            )
            inject = jax.lax.pcast(inject, (axis,), to='varying')
            state = jnp.where(stage_idx == 0, inject, state)
            # This stage is processing microbatch t - s (if in range).
            mb = t - stage_idx
            valid = (mb >= 0) & (mb < m)
            mb_c = jnp.clip(mb, 0, m - 1)
            taps = stage(state, mb_c)  # [L/S, b, ...]
            updated = jax.lax.dynamic_update_index_in_dim(
                taps_buf, taps.astype(taps_buf.dtype), mb_c, axis=1
            )
            taps_buf = jnp.where(valid, updated, taps_buf)
            # Hand the stage output one hop down the ring; the last stage's
            # send is dropped (its result was already stored above) and
            # stage 0 receives zeros it immediately overwrites.
            state = jax.lax.ppermute(
                taps[-1], axis, perm=[(i, i + 1) for i in range(s - 1)]
            )
            return (state, taps_buf), None

        (_, taps_buf), _ = jax.lax.scan(
            tick, (zeros_state, taps0), jnp.arange(m + s - 1)
        )
        # [L/S, M, b, ...] -> [L/S, B, ...]; the leading axis concatenates
        # across stages into the global layer axis via the P(axis) out_spec.
        return taps_buf.reshape((l_local, batch) + x_all.shape[2:])

    n_extra = x.ndim  # rank of [B, ...]
    shard = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis, *([None] * n_extra)),
        axis_names=frozenset({axis}),
    )
    return shard(params_staged, aux_staged, x_mb)


def _context_from_config(tpu_cfg: Any, mesh: Mesh) -> Optional[PipelineContext]:
    """PipelineContext from the `tpu:` config section, or None when
    `tpu.pipeline` is absent / the mesh has no pipe axis.

    Config schema::

        tpu:
          mesh: {data: 2, pipe: 4}
          pipeline: {microbatches: 8}   # stages = mesh axis size
    """
    pipe_cfg = tpu_cfg.get("pipeline") if tpu_cfg else None
    if pipe_cfg is None or PIPE_AXIS not in mesh.axis_names:
        return None
    micro = pipe_cfg.get("microbatches") if hasattr(pipe_cfg, "get") else None
    return PipelineContext(mesh, PIPE_AXIS, micro)


def pipeline_from_config(tpu_cfg: Any, mesh: Mesh):
    """`activate_pipeline` context manager from the config (no-op context
    when the config requests no pipeline)."""
    ctx = _context_from_config(tpu_cfg, mesh)
    if ctx is None:
        return contextlib.nullcontext()
    return activate_pipeline(ctx.mesh, ctx.axis, ctx.microbatches)


def enable_pipeline_from_config(tpu_cfg: Any, mesh: Mesh) -> bool:
    """Sticky (process-lifetime) variant of `pipeline_from_config` for the
    training/eval entry points: the context must be live whenever a jitted
    step TRACES, which for a training run is simply "always".  Returns True
    when a pipeline was activated.  Calling again REBINDS: a new config/mesh
    replaces the context, and a config without `tpu.pipeline` clears it (no
    stale mesh survives a rebuild in the same process).  CAVEAT: the context
    is consulted at TRACE time only — functions already jit-compiled keep
    the layout they were traced with; rebind BEFORE building/tracing the
    steps (fresh `make_train_step`/`Inferencer`), not between calls to an
    existing one."""
    _ACTIVE.set(_context_from_config(tpu_cfg, mesh))
    return current_pipeline() is not None
