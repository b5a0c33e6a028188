"""Orbax checkpointing: epoch_N + latest + best, with full resume.

TPU-native equivalent of the reference's torch checkpointing
(reference: segmentation/train_denseclip.py:892-908, 1491-1518 — periodic
`epoch_{N}.pth` + rolling `latest.pth`; utils.py:61-100 adds `model_best`).
The saved tree carries params / batch_stats / opt_state / step plus the
epoch and best metric, so `--resume` restores the optimizer and scheduler
position exactly (train_denseclip.py:1106-1133).

The separate init-time load — OpenAI CLIP weights into a fresh model — is
train/clip_import.py, mirroring the reference's split
(denseclip.py:156-191 vs trainer resume).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import orbax.checkpoint as ocp

from denseclip_vit_multimodal_tpu.train.state import TrainState


def _ckpt_dir(work_dir: str) -> str:
    return os.path.join(os.path.abspath(work_dir), "checkpoints")


_ASYNC_SAVER: Optional[ocp.AsyncCheckpointer] = None


def _async_saver() -> ocp.AsyncCheckpointer:
    global _ASYNC_SAVER
    if _ASYNC_SAVER is None:
        _ASYNC_SAVER = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_SAVER


def _repoint_symlink(link_path: str, target_name: str) -> None:
    """Atomically (re)point `link_path` at a sibling directory."""
    tmp = link_path + ".tmp"
    if os.path.lexists(tmp):
        os.unlink(tmp)
    os.symlink(target_name, tmp)
    if os.path.isdir(link_path) and not os.path.islink(link_path):
        # a real dir from an earlier sync-mode save: os.replace cannot
        # overwrite a directory
        import shutil

        shutil.rmtree(link_path)
    os.replace(tmp, link_path)


def wait_for_pending_saves() -> None:
    """Block until any async checkpoint writes have committed.

    Call before process exit, before restoring from a directory that may
    still be being written, and on preemption (the final save must be
    durable before the job dies).
    """
    if _ASYNC_SAVER is not None:
        _ASYNC_SAVER.wait_until_finished()


def _state_payload(state: TrainState) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(
    work_dir: str,
    state: TrainState,
    epoch: int,
    best_metric: Optional[float] = None,
    is_best: bool = False,
    keep: int = 5,
    async_save: bool = False,
) -> str:
    """Save `epoch_{N}` and update `latest` (+ `best` when is_best).

    Multi-host: EVERY process must call this — orbax saves of
    non-fully-addressable (replicated/sharded) arrays are collective, so a
    process-0-only call would hang waiting for the other hosts.  The
    rolling prune below runs on process 0 only.

    `async_save=True` (`training.async_checkpoint` in the config) writes
    ONE dir (`epoch_{N}`) in the background and repoints `latest`/`best`
    as atomic symlinks — AsyncCheckpointer.save blocks on the previous
    save's commit at entry, so queueing three full copies would stall the
    loop for most of a sync save anyway.  The symlink dangles until the
    background commit lands (orbax renames the tmp dir into place);
    callers must `wait_for_pending_saves()` before exiting or restoring
    (train/loop.py does).
    """
    import jax

    base = _ckpt_dir(work_dir)
    os.makedirs(base, exist_ok=True)
    payload = {
        "state": _state_payload(state),
        "meta": {
            "epoch": np.asarray(epoch, np.int32),
            "best_metric": np.asarray(
                -1.0 if best_metric is None else float(best_metric), np.float32
            ),
        },
    }
    path = os.path.join(base, f"epoch_{epoch}")
    aliases = ["latest"] + (["best"] if is_best else [])
    # Epoch dirs an alias pointed at BEFORE this save must survive this
    # call's prune: in async mode the new epoch dir isn't committed yet when
    # the symlink is repointed, so pruning the previous `best` target here
    # would leave a crash window with no valid best checkpoint at all.
    prev_targets = set()
    for name in aliases:
        link = os.path.join(base, name)
        if os.path.islink(link):
            prev_targets.add(os.path.basename(os.readlink(link)))
    if async_save:
        _async_saver().save(
            path, args=ocp.args.StandardSave(payload), force=True
        )
        if jax.process_index() == 0:
            for name in aliases:
                _repoint_symlink(os.path.join(base, name), f"epoch_{epoch}")
    else:
        # ONE full serialization; `latest`/`best` are atomic symlinks at
        # the committed epoch dir (same scheme as async mode — the old
        # sync path re-serialized the multi-GB payload once per alias,
        # tripling the save stall on a best epoch).  Unlike async there is
        # no dangle window: save() has committed before the repoint.
        with ocp.StandardCheckpointer() as saver:
            saver.save(path, payload, force=True)
        if jax.process_index() == 0:
            for name in aliases:
                _repoint_symlink(os.path.join(base, name), f"epoch_{epoch}")
        if jax.process_count() > 1:
            # Every process must observe the repointed aliases before its
            # save_checkpoint returns — a rank may immediately restore
            # `latest` (the OLD per-alias collective saves provided this
            # barrier implicitly; dropping them without one let rank>0
            # race the symlink and hang the collective restore).
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"denseclip_ckpt_{epoch}")
    # Rolling window of epoch_N dirs (latest/best never pruned).
    if jax.process_index() != 0:
        return path
    epochs = sorted(
        (
            int(d.split("_", 1)[1])
            for d in os.listdir(base)
            if d.startswith("epoch_") and d.split("_", 1)[1].isdigit()
        ),
    )
    # epoch dirs an alias symlink still points at must survive the window
    # (async mode's `best` can reference an arbitrarily old epoch), and so
    # must the dirs the aliases pointed at before this save (prev_targets)
    # while the new dir's async commit may still be in flight
    pinned = set(prev_targets)
    for name in ("latest", "best"):
        link = os.path.join(base, name)
        if os.path.islink(link):
            pinned.add(os.path.basename(os.readlink(link)))
    for old in epochs[:-keep] if keep else []:
        if f"epoch_{old}" in pinned:
            continue
        old_path = os.path.join(base, f"epoch_{old}")
        try:
            import shutil

            shutil.rmtree(old_path)
        except OSError:
            pass
    return path


def _resolve_ckpt_source(path_or_work_dir: str, which: str) -> str:
    """A checkpoint directory itself, or a work dir -> checkpoints/{which}."""
    path = os.path.abspath(path_or_work_dir)
    candidate = os.path.join(_ckpt_dir(path), which)
    if os.path.islink(candidate) and not os.path.isdir(
        os.path.realpath(candidate)
    ):
        # async-save crash window: the alias was repointed but the epoch
        # dir's background commit never landed.  The previous target is
        # still on disk (save_checkpoint pins it through the prune).
        raise FileNotFoundError(
            f"checkpoint alias {candidate!r} dangles (an async save was "
            f"interrupted before commit); restore from an explicit "
            f"epoch_N directory in {_ckpt_dir(path)!r} instead"
        )
    return candidate if os.path.isdir(candidate) else path


def restore_checkpoint(
    path_or_work_dir: str,
    state: TrainState,
    which: str = "latest",
) -> Tuple[TrainState, int, float]:
    """Restore into the given (abstract or concrete) state.

    Accepts either a checkpoint directory itself or a work dir (then picks
    `checkpoints/{which}`).  Returns (state, epoch, best_metric).
    """
    path = _resolve_ckpt_source(path_or_work_dir, which)
    template = {
        "state": _state_payload(state),
        "meta": {
            "epoch": np.asarray(0, np.int32),
            "best_metric": np.asarray(-1.0, np.float32),
        },
    }
    with ocp.StandardCheckpointer() as restorer:
        payload = restorer.restore(path, template)
    restored = state.replace(
        step=payload["state"]["step"],
        params=payload["state"]["params"],
        batch_stats=payload["state"]["batch_stats"],
        opt_state=payload["state"]["opt_state"],
    )
    return (
        restored,
        int(payload["meta"]["epoch"]),
        float(payload["meta"]["best_metric"]),
    )


def load_params_only(path_or_work_dir: str, state: TrainState) -> TrainState:
    """Warm-start weights without optimizer/scheduler (reference `--load`,
    train_denseclip.py:1012-1034).

    Template-FREE read: only params + batch_stats are taken from the
    saved tree, so the source run may use a different optimizer type,
    freeze set, or lr-mult grouping than this run — the cross-config
    warm start is exactly what `--load` exists for (a full-state
    template restore aborts on any opt_state tree mismatch)."""
    import jax
    import jax.numpy as jnp

    path = _resolve_ckpt_source(path_or_work_dir, "latest")
    with ocp.StandardCheckpointer() as restorer:
        payload = restorer.restore(path)
    saved = payload["state"]

    def onto(template_tree, saved_tree):
        # cast onto this run's dtypes AND shardings (a bare jnp.asarray
        # lands on device 0, clashing with a mesh-replicated rest-of-
        # state); treedef mismatch (different MODEL, not just optimizer)
        # still fails loudly here, as it should
        def one(t, x):
            x = jnp.asarray(x, getattr(t, "dtype", None))
            sharding = getattr(t, "sharding", None)
            if sharding is not None:
                x = jax.device_put(x, sharding)
            return x

        return jax.tree.map(one, template_tree, saved_tree)

    return state.replace(
        params=onto(state.params, saved["params"]),
        batch_stats=onto(state.batch_stats, saved["batch_stats"]),
    )
