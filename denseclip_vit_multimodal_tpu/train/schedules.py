"""Learning-rate schedules matching both reference config generations.

  * `cosine_per_epoch` — the working YAML path: torch CosineAnnealingLR with
    T_max epochs / eta_min, stepped ONCE PER EPOCH
    (reference: segmentation/train_denseclip.py:1075-1083, 1455).  The
    per-epoch stepping is reproduced by flooring the step counter to epoch
    boundaries.
  * `poly_with_warmup` — the mmseg-heritage path: poly power 0.9 with
    1500-iteration linear warmup at ratio 1e-6, min_lr 0
    (reference: segmentation/configs/denseclip_fpn_vit-b_640x640_80k.py:53-65,
    configs/_base_/schedules/schedule_80k.py:6-9).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def cosine_per_epoch(
    base_lr: float,
    steps_per_epoch: int,
    t_max_epochs: int,
    eta_min: float = 0.0,
) -> Schedule:
    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        epoch = jnp.minimum(step // steps_per_epoch, t_max_epochs)
        frac = epoch.astype(jnp.float32) / max(t_max_epochs, 1)
        return eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * frac)
        )

    return schedule


def poly_with_warmup(
    base_lr: float,
    total_steps: int,
    power: float = 0.9,
    warmup_steps: int = 1500,
    warmup_ratio: float = 1e-6,
    min_lr: float = 0.0,
) -> Schedule:
    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step_f = step.astype(jnp.float32)
        warm_frac = jnp.clip(step_f / max(warmup_steps, 1), 0.0, 1.0)
        warm_lr = base_lr * (warmup_ratio + (1.0 - warmup_ratio) * warm_frac)
        decay_frac = jnp.clip(step_f / max(total_steps, 1), 0.0, 1.0)
        poly_lr = (base_lr - min_lr) * (1.0 - decay_frac) ** power + min_lr
        return jnp.where(step < warmup_steps, warm_lr, poly_lr)

    return schedule


def constant(base_lr: float) -> Schedule:
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def build_schedule(
    training_cfg,
    steps_per_epoch: int,
    total_steps: Optional[int] = None,
) -> Schedule:
    """Schedule from the `training:` config section.

    Schema mirrors the reference YAML (`scheduler: {type: CosineAnnealingLR,
    T_max, eta_min}`, configs/denseclip_cityscapes.yaml:92-97) plus a
    `PolyWarmup` type carrying the mmseg-heritage hyperparameters.
    """
    get = training_cfg.get if hasattr(training_cfg, "get") else dict(training_cfg).get
    opt = get("optimizer", {}) or {}
    base_lr = float((opt.get if hasattr(opt, "get") else dict(opt).get)("lr", 2e-5))
    sched = get("scheduler", {}) or {}
    sget = sched.get if hasattr(sched, "get") else dict(sched).get
    stype = sget("type", "CosineAnnealingLR")
    if stype in ("CosineAnnealingLR", "cosine"):
        return cosine_per_epoch(
            base_lr,
            steps_per_epoch=steps_per_epoch,
            t_max_epochs=int(sget("T_max", get("epochs", 100))),
            eta_min=float(sget("eta_min", 0.0)),
        )
    if stype in ("PolyWarmup", "PolyLR", "poly"):
        if total_steps is None:
            # iteration-based presets (schedule_{20k,40k,80k,160k}) carry
            # `training.iters`; epoch presets fall back to epochs x steps.
            iters = get("iters")
            total_steps = (
                int(iters) if iters else steps_per_epoch * int(get("epochs", 100))
            )
        warmup = sget("warmup_steps", sget("warmup_iters", 1500))
        return poly_with_warmup(
            base_lr,
            total_steps=int(sget("total_steps", total_steps)),
            power=float(sget("power", 0.9)),
            warmup_steps=int(warmup),
            warmup_ratio=float(sget("warmup_ratio", 1e-6)),
            min_lr=float(sget("min_lr", 0.0)),
        )
    if stype in ("constant", "none", None):
        return constant(base_lr)
    raise ValueError(f"Unsupported scheduler type: {stype}")
