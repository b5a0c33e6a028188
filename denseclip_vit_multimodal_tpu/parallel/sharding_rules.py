"""Tensor-parallel sharding rules (Megatron-style) for DenseCLIP params.

The reference scales only by data parallelism (DDP, SURVEY.md §2.8).  On a
TPU mesh we additionally shard the transformer weights over a `model` axis —
column-parallel into the heads/hidden dim, row-parallel out of it — and let
XLA's SPMD partitioner insert the all-reduces on ICI.  No collective is
written by hand; the rules only assign `PartitionSpec`s:

  qkv / c_fc kernels  [.., D, 3D|4D]  -> shard LAST dim  (column parallel)
  out / c_proj kernels [.., 3D|4D, D] -> shard FIRST weight dim (row parallel)
  biases of column-parallel layers    -> shard over model
  everything else (embeddings, norms, convs, heads, prompt) -> replicated

Scan-stacked blocks carry a leading layer axis; the rules below index from
the END of the shape so they work for both stacked [L, D, 3D] and unstacked
[D, 3D] layouts.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from denseclip_vit_multimodal_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path-suffix match, which weight dim to shard counted from the end)
_COLUMN_SUFFIXES = (("attn", "qkv", "kernel"), ("mlp", "c_fc", "kernel"))
_ROW_SUFFIXES = (("attn", "out", "kernel"), ("mlp", "c_proj", "kernel"))
_COLUMN_BIAS_SUFFIXES = (("attn", "qkv", "bias"), ("mlp", "c_fc", "bias"))


def _path_names(path: Tuple) -> Tuple[str, ...]:
    return tuple(
        p.key if hasattr(p, "key") else str(p) for p in path
    )


def _ends_with(names: Tuple[str, ...], suffix: Tuple[str, ...]) -> bool:
    return len(names) >= len(suffix) and names[-len(suffix):] == suffix


def param_partition_spec(path: Tuple, leaf) -> P:
    """PartitionSpec for one parameter leaf (replicated by default)."""
    names = _path_names(path)
    ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
    if any(_ends_with(names, s) for s in _COLUMN_SUFFIXES):
        spec = [None] * ndim
        spec[-1] = MODEL_AXIS
        return P(*spec)
    if any(_ends_with(names, s) for s in _ROW_SUFFIXES):
        spec = [None] * ndim
        spec[-2] = MODEL_AXIS
        return P(*spec)
    if any(_ends_with(names, s) for s in _COLUMN_BIAS_SUFFIXES):
        spec = [None] * ndim
        spec[-1] = MODEL_AXIS
        return P(*spec)
    return P()


def tree_partition_specs(params: Any) -> Any:
    """PartitionSpec pytree for a DenseCLIP param tree."""
    return jax.tree_util.tree_map_with_path(param_partition_spec, params)


def _divisible(leaf, spec: P, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if leaf.shape[dim] % mesh.shape[axis] != 0:
            return False
    return True


# Leaves below this element count stay replicated under FSDP: sharding a
# LayerNorm vector saves nothing and adds an all-gather to every use.
FSDP_MIN_SIZE = 2 ** 15


def fsdp_extend_spec(spec: P, leaf, dp_size: int,
                     min_size: int = FSDP_MIN_SIZE) -> P:
    """Add a DATA-axis shard (ZeRO-3 / FSDP) to `spec` on the largest free,
    divisible dim of `leaf`.

    The reference has no analog (its DDP replicates the full model per GPU,
    segmentation/train_denseclip.py:1050-1054); on a TPU mesh, sharding
    params + Adam moments over `data` divides optimizer/param HBM by the dp
    degree and XLA SPMD inserts the all-gather (params, per use) and
    reduce-scatter (grads) on ICI automatically — no hand-written
    collectives, exactly the scaling-book recipe.

    Rules: never touch a dim already sharded (TP owns it); never shard
    dim 0 of rank>=3 leaves (the `nn.scan` layer axis — the GPipe pipeline
    reshapes it, parallel/pipeline.py:144-146); skip leaves smaller than
    `min_size`.
    """
    ndim = getattr(leaf, "ndim", 0)
    size = getattr(leaf, "size", 0)
    if ndim == 0 or size < min_size or dp_size <= 1:
        return spec
    entries = list(spec) + [None] * (ndim - len(spec))
    best = None
    for d in range(ndim):
        if entries[d] is not None:
            continue
        if ndim >= 3 and d == 0:
            continue  # scan/layer axis
        if leaf.shape[d] % dp_size != 0:
            continue
        if best is None or leaf.shape[d] > leaf.shape[best]:
            best = d
    if best is None:
        return spec
    entries[best] = DATA_AXIS
    return P(*entries)


def resolved_spec(path, leaf, mesh: Mesh, fsdp: bool = False,
                  fsdp_min_size: int = FSDP_MIN_SIZE) -> P:
    """Final PartitionSpec for one param leaf on `mesh`: TP rules (with
    replication fallback for non-divisible dims), optionally extended with
    the FSDP data-axis shard."""
    spec = P()
    if MODEL_AXIS in mesh.axis_names:
        spec = param_partition_spec(path, leaf)
        if spec != P() and not _divisible(leaf, spec, mesh):
            spec = P()
    if fsdp and DATA_AXIS in mesh.axis_names:
        spec = fsdp_extend_spec(
            spec, leaf, int(mesh.shape[DATA_AXIS]), min_size=fsdp_min_size
        )
    return spec


def shard_params(params: Any, mesh: Mesh, fsdp: bool = False,
                 fsdp_min_size: int = FSDP_MIN_SIZE) -> Any:
    """Place a param tree on the mesh: TP rules (replication fallback for
    non-divisible dims), plus ZeRO-3 data-axis sharding when `fsdp`."""
    if MODEL_AXIS not in mesh.axis_names and not fsdp:
        return jax.device_put(params, NamedSharding(mesh, P()))

    def put(path, leaf):
        spec = resolved_spec(path, leaf, mesh, fsdp, fsdp_min_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def shard_train_state(state, mesh: Mesh, fsdp: bool = False,
                      fsdp_min_size: int = FSDP_MIN_SIZE):
    """Shard a TrainState: params/opt_state by TP (+ optional FSDP) rules,
    rest replicated.

    Adam moments share the parameter layout, so the same specs apply; scalar
    opt-state leaves (counts) replicate.
    """
    params = shard_params(state.params, mesh, fsdp, fsdp_min_size)

    def resolved(path, leaf):
        return resolved_spec(path, leaf, mesh, fsdp, fsdp_min_size)

    # Match opt-state leaves (Adam mu/nu mirror the params dict structure
    # inside optax wrapper states) to their param's spec BY KEY PATH: the
    # longest suffix of the opt leaf's path that equals a full param path
    # wins.  A (shape, dtype) lookup is ambiguous — two params sharing
    # shape+dtype but different specs would collide last-wins and place one
    # moment against the wrong sharding.
    def _key(entry):
        return str(getattr(entry, "key", getattr(entry, "name",
                   getattr(entry, "idx", entry))))

    spec_by_path = {}
    def record(path, leaf):
        spec_by_path[tuple(_key(p) for p in path)] = resolved(path, leaf)
        return leaf
    jax.tree_util.tree_map_with_path(record, state.params)

    def put_opt(path, leaf):
        spec = P()
        if hasattr(leaf, "ndim") and leaf.ndim > 0:
            keys = tuple(_key(p) for p in path)
            for i in range(len(keys)):
                got = spec_by_path.get(keys[i:])
                if got is not None:
                    spec = got
                    break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    opt_state = jax.tree_util.tree_map_with_path(put_opt, state.opt_state)
    rep = NamedSharding(mesh, P())
    return state.replace(
        params=params,
        opt_state=opt_state,
        batch_stats=jax.device_put(state.batch_stats, rep),
        step=jax.device_put(state.step, rep),
    )
