"""Live multi-process worker: one rank of a 2-process data-parallel train step.

Launched by tests/test_multiprocess_live.py with
  JAX_COORDINATOR_ADDRESS=localhost:<port> JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=i
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4
so that 2 processes x 4 virtual CPU devices form one 8-device global mesh with
cross-process (Gloo) collectives — the TPU-pod execution shape the reference
reaches via mp.spawn + NCCL process groups
(reference: segmentation/train_denseclip.py:1654-1657, denseclip/utils.py:102-107).

Run single-process (no coordinator env) over 8 local devices, it computes the
SAME global step — the test asserts loss equality across both launch shapes,
proving `maybe_initialize_distributed`, multi-process `replicate`, and the
`make_array_from_process_local_data` branch of `shard_batch` live.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GLOBAL_BATCH = 8


def _global_batch():
    import numpy as np

    return {
        "image": np.random.RandomState(0)
        .randint(0, 255, (GLOBAL_BATCH, 64, 128, 3))
        .astype(np.uint8),
        "seg": np.random.RandomState(1)
        .randint(0, 19, (GLOBAL_BATCH, 64, 128))
        .astype(np.uint8),
        "depth": np.random.RandomState(2)
        .uniform(0, 80, (GLOBAL_BATCH, 64, 128))
        .astype(np.float32),
    }


def _sync(name: str, timeout_ms: int = 600_000) -> None:
    """Align ranks at a coordination-service barrier before the first Gloo
    collective.  Gloo's context init has a hard ~30 s key-value window; on
    a contended 1-CPU host the two workers' train-step COMPILES skew by
    minutes, so the first rank to reach execution times out waiting for
    the other ("GetKeyValue() timed out", observed when the full suite
    runs concurrently).  The coordination-service barrier rides the
    already-open coordinator TCP connection (no Gloo) and takes a generous
    timeout — compile first, sync here, then execute.  No-op when
    single-process."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def main() -> None:
    # MUST run before anything touches the jax backend (mesh.py:43-47).
    from denseclip_vit_multimodal_tpu.parallel.mesh import (
        local_batch_size,
        make_mesh,
        maybe_initialize_distributed,
        replicate,
        shard_batch,
    )

    maybe_initialize_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as graft
    from denseclip_vit_multimodal_tpu.data.augment import AugmentConfig
    from denseclip_vit_multimodal_tpu.train.state import create_train_state
    from denseclip_vit_multimodal_tpu.train.step import make_train_step

    rank = jax.process_index()
    nproc = jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    mesh = make_mesh({"data": 8})
    cfg, model, texts = graft._build(tiny=True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64, 3), jnp.float32),
        jnp.asarray(texts),
    )
    state = create_train_state(model, variables, cfg.get("training", {}), 10)
    # multi-process: exercises the committed-array -> host -> global
    # device_put path (mesh.py::replicate)
    _sync("mplive_replicate")
    state = replicate(state, mesh)

    lb = local_batch_size(GLOBAL_BATCH, mesh)
    assert lb == GLOBAL_BATCH // nproc, (lb, nproc)
    batch = {
        k: v[rank * lb : (rank + 1) * lb] for k, v in _global_batch().items()
    }
    # multi-process: exercises make_array_from_process_local_data
    # (mesh.py::shard_batch)
    batch = shard_batch(batch, mesh)

    aug_cfg = AugmentConfig(crop_size=(32, 64), scale_range=(0.5, 2.0))
    train_step = make_train_step(texts, aug_cfg, grad_accum_steps=1)
    # AOT-compile, align ranks, THEN execute (see _sync).
    compiled = train_step.lower(state, batch, jax.random.PRNGKey(0)).compile()
    _sync("mplive_dp_step")
    state, metrics = compiled(state, batch, jax.random.PRNGKey(0))
    loss = float(metrics["loss_total"])
    assert np.isfinite(loss), loss

    # Cross-process metric reduction (tools/test.py's multi-host eval
    # finalization): every rank must recover the GLOBAL sum of per-rank
    # accumulators from a host-local numpy array.
    from jax.experimental import multihost_utils

    local_cm = np.full((2, 2), rank + 1, np.float64)
    gsum = np.asarray(multihost_utils.process_allgather(local_cm)).sum(axis=0)
    expect = nproc * (nproc + 1) // 2
    assert (gsum == expect).all(), gsum

    # Collective checkpoint save/restore (when the test provides a shared
    # dir): orbax saves of non-fully-addressable (multi-host replicated)
    # arrays are collective — EVERY process must call save, the exact
    # contract train/loop.py relies on.  A process-0-only save would hang
    # here.
    ckpt_dir = os.environ.get("MPLIVE_CKPT_DIR")
    if ckpt_dir:
        from denseclip_vit_multimodal_tpu.train import checkpoint as ckpt_lib

        ckpt_lib.save_checkpoint(ckpt_dir, state, epoch=0, best_metric=0.5)
        restored, epoch, best = ckpt_lib.restore_checkpoint(ckpt_dir, state)
        assert epoch == 0 and abs(best - 0.5) < 1e-6, (epoch, best)
        assert int(restored.step) == int(state.step)
        print(f"MPLIVE_CKPT rank={rank} ok", flush=True)

    print(f"MPLIVE rank={rank} nproc={nproc} loss={loss!r}", flush=True)

    # Pipeline parallelism ACROSS the process boundary: mesh {pipe: 2,
    # data: 4} puts stage 0 entirely on this process's devices and stage 1
    # on the peer's, so every GPipe activation hop (lax.ppermute,
    # parallel/pipeline.py) crosses the Gloo transport.  Run the same
    # global step pipelined; the test asserts rank equality and equality
    # with the single-process pipelined run (identical rng streams — both
    # launch shapes fold the same microbatch indices).
    from denseclip_vit_multimodal_tpu.parallel.pipeline import (
        activate_pipeline,
    )

    from denseclip_vit_multimodal_tpu.parallel.mesh import (
        data_axis_is_process_local,
    )

    mesh_pp = make_mesh({"pipe": 2, "data": 4})
    if nproc > 1:
        # the loader-contract check must classify both layouts correctly
        assert data_axis_is_process_local(mesh)  # {data: 8}, data-leading
        assert not data_axis_is_process_local(mesh_pp)  # pipe-major
    variables_pp = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64, 3), jnp.float32),
        jnp.asarray(texts),
    )
    state_pp = create_train_state(
        model, variables_pp, cfg.get("training", {}), 10
    )
    state_pp = replicate(state_pp, mesh_pp)
    # {pipe: 2, data: 4} is pipe-major: each process's 4 devices hold one
    # ENTIRE pipe stage (all 4 data shards), so the per-process-slice loader
    # contract does not apply — every process feeds the full global batch
    # and shard_batch extracts the addressable shards.
    batch_pp = shard_batch(_global_batch(), mesh_pp, process_local=False)
    with activate_pipeline(mesh_pp):
        step_pp = make_train_step(texts, aug_cfg, grad_accum_steps=1)
        compiled_pp = step_pp.lower(
            state_pp, batch_pp, jax.random.PRNGKey(0)
        ).compile()
        _sync("mplive_pp_step")
        state_pp, metrics_pp = compiled_pp(
            state_pp, batch_pp, jax.random.PRNGKey(0)
        )
    loss_pp = float(metrics_pp["loss_total"])
    assert np.isfinite(loss_pp), loss_pp
    print(f"MPLIVE_PP rank={rank} nproc={nproc} loss={loss_pp!r}", flush=True)


if __name__ == "__main__":
    main()
