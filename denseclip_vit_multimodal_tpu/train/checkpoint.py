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

    `async_save=True` (`training.async_checkpoint` in the config) returns
    after the device→host snapshot; the serialization/commit overlaps the
    next training steps.  Callers must `wait_for_pending_saves()` before
    exiting or restoring (train/loop.py does).
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
    targets = [os.path.join(base, f"epoch_{epoch}"),
               os.path.join(base, "latest")]
    if is_best:
        targets.append(os.path.join(base, "best"))
    path = targets[0]
    if async_save:
        saver = _async_saver()
        for t in targets:
            # AsyncCheckpointer serializes queued saves internally; the
            # call returns once the in-memory snapshot is taken
            saver.save(t, args=ocp.args.StandardSave(payload), force=True)
    else:
        with ocp.StandardCheckpointer() as saver:
            for t in targets:
                saver.save(t, payload, force=True)
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
    for old in epochs[:-keep] if keep else []:
        old_path = os.path.join(base, f"epoch_{old}")
        try:
            import shutil

            shutil.rmtree(old_path)
        except OSError:
            pass
    return path


def restore_checkpoint(
    path_or_work_dir: str,
    state: TrainState,
    which: str = "latest",
) -> Tuple[TrainState, int, float]:
    """Restore into the given (abstract or concrete) state.

    Accepts either a checkpoint directory itself or a work dir (then picks
    `checkpoints/{which}`).  Returns (state, epoch, best_metric).
    """
    path = os.path.abspath(path_or_work_dir)
    candidate = os.path.join(_ckpt_dir(path), which)
    if os.path.isdir(candidate):
        path = candidate
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
    train_denseclip.py:1012-1034)."""
    restored, _, _ = restore_checkpoint(path_or_work_dir, state)
    return state.replace(
        params=restored.params, batch_stats=restored.batch_stats
    )
