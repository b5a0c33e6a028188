"""Device mesh + sharding setup (the TPU-native replacement for DDP/NCCL).

The reference's only parallelism is single-node data-parallel DDP over NCCL
(reference: segmentation/denseclip/utils.py:102-107 hardcodes
localhost:12355; train_denseclip.py:1050-1054 wraps in DDP).  Here the same
capability is expressed the JAX way (SURVEY.md §2.8):

  * one `jax.sharding.Mesh` over all addressable devices, axes driven by the
    `tpu.mesh` config entry (e.g. ``{data: -1}`` or ``{data: 4, model: 2}``);
  * batches sharded over the ``data`` axis with `NamedSharding`;
  * parameters replicated (data parallel) — gradient averaging is inserted
    by XLA as `psum` over ICI when the loss is computed under these
    shardings, no explicit collectives needed;
  * multi-host: `jax.distributed.initialize()` + `make_global_batch` using
    `jax.make_array_from_process_local_data` replaces `DistributedSampler`.

All helpers work identically on a virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``), which is how the
multi-chip path is tested without hardware.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed() -> None:
    """Initialize multi-host JAX if launched under a multi-process runtime.

    Mirrors the intent of the reference's `init_distributed` (utils.py:102-107)
    but without the hardcoded localhost rendezvous: `jax.distributed` reads
    its coordinator from the environment (TPU pods set this up natively).
    Safe to call when single-process.

    Ordering matters: `jax.distributed.initialize()` must run BEFORE anything
    initializes the backend (`jax.devices()`, `jax.process_count()`, any
    computation) — once the backend exists single-process, initialize() fails.
    So the decision is made purely from the environment, never by querying
    the backend.

    Launcher contract: managed environments (TPU pods, Slurm, OMPI) are
    detected here by their own environment markers and handed to jax's
    cluster auto-detection (`jax.distributed.initialize()` with no args);
    ad-hoc launches (tools/dist_train.sh, tests) set
      JAX_COORDINATOR_ADDRESS=host:port  JAX_NUM_PROCESSES=N  JAX_PROCESS_ID=i
    — the latter two are this framework's extension (jax itself only reads
    the coordinator address from the env) and are forwarded explicitly.
    """
    import os

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        # Managed multi-process runtimes carry their own markers; without
        # this check a 2-node Slurm/OMPI launch would silently train as two
        # independent single-process jobs (auto-detection only happens
        # INSIDE jax.distributed.initialize, so someone must call it).
        # Require a PER-STEP marker, not just allocation-level vars: a
        # plain `python tools/...` inside an sbatch allocation created
        # with --ntasks=2 sees SLURM_NTASKS=2 but is a single process —
        # initializing there would wait forever for peers.  SLURM_PROCID
        # alone is NOT enough (Slurm also sets PROCID=0 in the batch
        # step's own environment); SLURM_STEP_NUM_TASKS reflects the
        # CURRENT step, so it is >1 only for processes srun actually
        # launched as one of N tasks.
        managed = (
            (
                int(os.environ.get("SLURM_STEP_NUM_TASKS", "1")) > 1
                and os.environ.get("SLURM_PROCID") is not None
            )
            or (
                int(os.environ.get("OMPI_COMM_WORLD_SIZE", "1")) > 1
                and os.environ.get("OMPI_COMM_WORLD_RANK") is not None
            )
            or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        )
        if not managed:
            return  # single-process launch: nothing to do, backend untouched
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return
        jax.distributed.initialize()  # cluster auto-detection
        return
    from jax._src import distributed as _dist

    # already-initialized guard that does NOT touch the XLA backend
    if getattr(_dist.global_state, "client", None) is not None:
        return
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def make_mesh(
    spec: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from an axis spec like ``{"data": -1}`` or
    ``{"data": 4, "model": 2}``.  A single ``-1`` axis absorbs all remaining
    devices (np.reshape semantics)."""
    explicit_devices = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    spec = dict(spec or {DATA_AXIS: -1})
    axis_names = tuple(spec.keys())
    sizes = list(spec.values())
    n = len(devices)
    n_free = sizes.count(-1)
    if n_free > 1:
        raise ValueError(f"at most one mesh axis may be -1, got {spec}")
    fixed = math.prod(s for s in sizes if s != -1)
    if n_free:
        if n % fixed != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes {spec}")
        sizes = [n // fixed if s == -1 else s for s in sizes]
    elif fixed != n:
        raise ValueError(f"mesh {spec} needs {fixed} devices, have {n}")
    if not explicit_devices and len(sizes) > 1:
        # Topology-aware assignment: a flat reshape can place "model"-axis
        # neighbors on non-adjacent ICI links; create_device_mesh picks an
        # ordering whose inner axes ride the fastest links.  Explicit device
        # lists (tests, sub-meshes) keep plain reshape semantics.
        try:
            from jax.experimental import mesh_utils

            return Mesh(mesh_utils.create_device_mesh(sizes), axis_names)
        except Exception as e:
            # e.g. host-platform (virtual CPU) device sets have no topology;
            # fall through to reshape ordering — but say so, because on a
            # real pod a silent fallback costs ICI locality.
            import logging

            logging.getLogger("denseclip_tpu").info(
                "topology-aware mesh unavailable (%s); using reshape order", e
            )
    grid = np.asarray(devices).reshape(sizes)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding for a [B, ...] batch: leading dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(
    batch: Any,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    *,
    process_local: bool = True,
) -> Any:
    """Put a host-local pytree of [B, ...] arrays onto the mesh, batch-sharded.

    Single-process: a plain sharded device_put.  Multi-process: each process
    contributes its local shard of the global batch
    (`make_array_from_process_local_data`), the JAX-native replacement for
    the reference's `DistributedSampler` (train_denseclip.py:242-243).

    `process_local=True` (the loader contract) assumes each process's
    devices own a contiguous, disjoint 1/num_processes slice of the data
    axis — true when `data` is the mesh's LEADING axis (the device order is
    process-major).  For layouts where another axis leads and each
    process's devices replicate the whole batch (e.g. a cross-process
    `{pipe: S, data: N}` pipeline), pass `process_local=False` and give
    EVERY process the full global batch; each process then contributes the
    shards its devices address.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)

    def put(x):
        x = np.asarray(x)
        if process_local:
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        else:
            global_shape = x.shape
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/state) across the mesh.

    Multi-process: `jax.device_put` rejects COMMITTED single-device arrays
    (e.g. `jax.jit(model.init)` outputs) when the target sharding spans
    non-addressable devices, so route them through host memory first —
    params are identical on every process by construction (same PRNG seed /
    same checkpoint), which device_put's cross-process equality check
    verifies.  Found by the live 2-process test
    (tests/test_multiprocess_live.py); single-process placement is
    unchanged.
    """
    if jax.process_count() > 1:
        tree = jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
        )
    return jax.device_put(tree, replicated_sharding(mesh))


def data_axis_is_process_local(mesh: Mesh, axis: str = DATA_AXIS) -> bool:
    """True iff each process's devices own a contiguous, disjoint
    1/num_processes slice of the ``axis``-sharded batch dimension — the
    loader contract behind ``shard_batch(process_local=True)``.

    Holds for data-leading meshes (``{data: N, model: M}``); FAILS when
    another axis leads and a process's devices replicate the whole batch
    (e.g. ``{pipe: 2, data: 4}`` over 2 processes, or ``{model: 2,
    data: 4}``) — those layouts need ``process_local=False`` with every
    process feeding the full global batch.
    """
    nproc = jax.process_count()
    if nproc == 1:
        return True
    n = mesh.shape[axis]
    if n % nproc:
        return False
    sharding = batch_sharding(mesh, axis)
    per_rank = n // nproc
    for dev, idx in sharding.devices_indices_map((n,)).items():
        lo = idx[0].start or 0
        hi = idx[0].stop if idx[0].stop is not None else n
        rank = dev.process_index
        if not (rank * per_rank <= lo and hi <= (rank + 1) * per_rank):
            return False
    return True


def local_batch_size(global_batch: int, mesh: Mesh, axis: str = DATA_AXIS) -> int:
    """Per-process batch size for a global batch sharded over `axis`."""
    per_process = global_batch // jax.process_count()
    if global_batch % jax.process_count():
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{jax.process_count()} processes"
        )
    return per_process


def mesh_from_config(tpu_cfg: Optional[Mapping[str, Any]]) -> Mesh:
    """Mesh from the `tpu:` config section (``mesh: {data: -1}``)."""
    spec = None
    if tpu_cfg:
        spec = tpu_cfg.get("mesh")
        if spec is not None:
            spec = dict(spec)
    return make_mesh(spec)
