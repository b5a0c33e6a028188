"""Train state: frozen-aware optimizer partitioning + parameter groups.

The reference's central trick is frozen CLIP towers with a learnable prompt
flowing through them: backbone + text-encoder parameters get
`requires_grad=False` and the optimizer only ever sees the rest
(reference: segmentation/train_denseclip.py:1037-1047); the learnable
`contexts`/`gamma` live on the composite model (denseclip.py:377-406).

JAX formulation: parameters are labeled by their top-level module path and
`optax.multi_transform` routes frozen labels to `set_to_zero` — optimizer
state (Adam moments) is only materialized for trainable leaves, which is
what keeps the memory footprint at "heads + neck + prompt" scale.

The mmseg-heritage per-group multipliers (backbone lr x0.1, text x0.0,
norm decay_mult 0 — configs/denseclip_fpn_vit-b_640x640_80k.py:53-63) are
expressed with the same labeling mechanism via `lr_mults`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

Params = Any

FROZEN = "frozen"
DEFAULT_FROZEN_MODULES = ("backbone", "text_encoder")


class TrainState(struct.PyTreeNode):
    """Carries everything a jitted step mutates."""

    step: jnp.ndarray
    params: Params
    batch_stats: Params
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads: Params) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def _top_level_label(path: Tuple, frozen_modules: Tuple[str, ...]) -> str:
    head = path[0].key if hasattr(path[0], "key") else str(path[0])
    return FROZEN if head in frozen_modules else head


def label_params(
    params: Params, frozen_modules: Tuple[str, ...] = DEFAULT_FROZEN_MODULES
) -> Params:
    """Label tree: each leaf -> its top-level module name, or 'frozen'."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _top_level_label(path, frozen_modules), params
    )


def trainable_mask(
    params: Params, frozen_modules: Tuple[str, ...] = DEFAULT_FROZEN_MODULES
) -> Params:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _top_level_label(path, frozen_modules) != FROZEN, params
    )


def count_params(tree: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))


def build_optimizer(
    params: Params,
    schedule: Callable,
    weight_decay: float = 0.01,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    clip_grad_norm: Optional[float] = None,
    frozen_modules: Tuple[str, ...] = DEFAULT_FROZEN_MODULES,
    lr_mults: Optional[Mapping[str, float]] = None,
    opt_type: str = "adamw",
    momentum: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW or SGD over trainable labels; frozen labels get zero updates.

    `lr_mults` maps top-level module names to multipliers (mult 0 behaves
    like freezing but keeps Adam state; prefer `frozen_modules` for true
    freezing).  For AdamW, weight decay is decoupled and masked off
    scale/bias/norm leaves, matching the reference heritage
    `norm_decay_mult=0`.  `opt_type: sgd` mirrors the reference trainer's
    second optimizer choice (train_denseclip.py:1062 builds
    `torch.optim.SGD(params, **opt_cfg)`): COUPLED weight decay added to
    the gradient before the momentum buffer, applied to every leaf, with
    `buf = momentum*buf + g; p -= lr*buf` semantics (optax.trace).
    """
    lr_mults = dict(lr_mults or {})
    opt_type = str(opt_type).lower()
    if opt_type not in ("adamw", "sgd"):
        raise ValueError(f"Unsupported optimizer type: {opt_type}")

    def wd_mask(p):
        def keep(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            return leaf.ndim > 1 and name not in ("scale", "bias", "embedding")

        return jax.tree_util.tree_map_with_path(keep, p)

    def tx_for(mult: float) -> optax.GradientTransformation:
        lr = optax.scale_by_learning_rate(lambda step: schedule(step) * mult)
        if opt_type == "sgd":
            steps = []
            if weight_decay:
                steps.append(optax.add_decayed_weights(weight_decay))
            if momentum:
                steps.append(optax.trace(decay=momentum))
            return optax.chain(*steps, lr)
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            lr,
        )

    labels = label_params(params, frozen_modules)
    label_set = set(jax.tree.leaves(labels))
    transforms: Dict[str, optax.GradientTransformation] = {}
    for label in label_set:
        if label == FROZEN:
            transforms[label] = optax.set_to_zero()
        else:
            transforms[label] = tx_for(float(lr_mults.get(label, 1.0)))
    tx = optax.multi_transform(transforms, labels)
    if clip_grad_norm:
        # ONE global-norm clip over the whole gradient tree, applied before
        # the per-module transforms — inside multi_transform each label
        # group would clip its own subtree independently, letting the true
        # global norm reach sqrt(n_groups) x the threshold (torch
        # clip_grad_norm_ semantics are global; frozen branches carry
        # zero-filled grads so they don't perturb the norm).
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    return tx


def _lr_mults_from_cfg(get) -> Optional[Dict[str, float]]:
    """Per-module LR multipliers from either config schema.

    `lr_mults: {backbone: 0.1}` (our native form) or the mmseg-heritage
    `paramwise: {backbone_lr_mult: 0.1, text_encoder_lr_mult: 0.0}`
    (reference denseclip_fpn_vit-b_640x640_80k.py:53-63 paramwise_cfg).
    """
    mults = dict(get("lr_mults", None) or {})
    paramwise = get("paramwise", None) or {}
    pget = paramwise.get if hasattr(paramwise, "get") else dict(paramwise).get
    for key in ("backbone", "text_encoder"):
        v = pget(f"{key}_lr_mult", None)
        if v is not None:
            mults.setdefault(key, float(v))
    return {k: float(v) for k, v in mults.items()} or None


def frozen_modules_from_cfg(
    training_cfg,
    default: Tuple[str, ...] = DEFAULT_FROZEN_MODULES,
) -> Tuple[str, ...]:
    """Frozen-module set implied by the config's LR multipliers.

    The reference heritage recipe trains the backbone at lr x0.1 with the
    text tower at lr x0 (denseclip_fpn_vit-b_640x640_80k.py:53-63).  A
    module given a POSITIVE lr mult must therefore be unfrozen; a mult of
    exactly 0 is true freezing (zero updates, no optimizer state).
    """
    get = training_cfg.get if hasattr(training_cfg, "get") else dict(training_cfg).get
    frozen = set(default)
    for name, mult in (_lr_mults_from_cfg(get) or {}).items():
        if float(mult) > 0.0:
            frozen.discard(name)
        else:
            frozen.add(name)
    return tuple(sorted(frozen))


def create_train_state(
    model,
    variables: Mapping[str, Any],
    training_cfg,
    steps_per_epoch: int,
    frozen_modules: Optional[Tuple[str, ...]] = None,
) -> TrainState:
    """TrainState from init variables + the `training:` config section.

    `frozen_modules` defaults to the config-implied set (see
    `frozen_modules_from_cfg`): the CLIP towers frozen, unless the config
    assigns a positive lr mult (heritage backbone-lr x0.1 recipe).
    """
    from denseclip_vit_multimodal_tpu.train.schedules import build_schedule

    get = training_cfg.get if hasattr(training_cfg, "get") else dict(training_cfg).get
    opt_cfg = get("optimizer", {}) or {}
    oget = opt_cfg.get if hasattr(opt_cfg, "get") else dict(opt_cfg).get

    if frozen_modules is None:
        frozen_modules = frozen_modules_from_cfg(training_cfg)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    schedule = build_schedule(training_cfg, steps_per_epoch)
    tx = build_optimizer(
        params,
        schedule,
        weight_decay=float(oget("weight_decay", 0.01)),
        betas=tuple(oget("betas", (0.9, 0.999))),
        eps=float(oget("eps", 1e-8)),
        clip_grad_norm=get("clip_grad_norm", None),
        frozen_modules=frozen_modules,
        lr_mults=_lr_mults_from_cfg(get),
        opt_type=str(oget("type", "AdamW")),
        momentum=float(oget("momentum", 0.0)),
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )
