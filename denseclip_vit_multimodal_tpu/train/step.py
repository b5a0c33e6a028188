"""Jitted train / eval steps (pjit-ready: shard the batch, XLA does the rest).

One compiled program per step fuses: on-device augmentation (data/augment.py)
-> forward (bf16 hot path) -> CE + masked SILog -> backward over TRAINABLE
leaves only -> optimizer update -> metric reductions.  Under a data-sharded
mesh the gradient/metric reductions become ICI `psum`s inserted by XLA — the
TPU-native replacement for the reference's DDP allreduce hooks
(reference: segmentation/train_denseclip.py:1050-1054, 1226-1358).

Design choices vs the reference trainer loop (train_denseclip.py:1183-1385):
  * grads are only computed for trainable params (backbone/text towers are
    closed over, not differentiated) — activation gradients still flow
    through the frozen text tower into the learnable prompt, the DenseCLIP
    trick (denseclip.py:391-405);
  * gradient accumulation is a `lax.scan` over microbatches inside ONE
    compiled step (reference divides loss and steps every N batches,
    :1154, 1314, 1356-1358);
  * non-finite losses skip the update on device (reference checks on host
    and `continue`s, :1323-1324).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from denseclip_vit_multimodal_tpu.data.augment import (
    AugmentConfig,
    augment_batch,
    eval_preprocess_batch,
)
from denseclip_vit_multimodal_tpu.train.losses import (
    cross_entropy_loss,
    silog_loss,
)
from denseclip_vit_multimodal_tpu.train.metrics import (
    confusion_matrix,
    depth_errors,
)
from denseclip_vit_multimodal_tpu.train.state import TrainState


def _applied_schedule_count(opt_state):
    """Number of optimizer updates actually APPLIED so far: the count of
    the first ScaleBySchedule/ScaleByAdam state found in the tree (all
    trainable groups share the global finite gate, so their counts agree).
    None if the optimizer carries no counted transform."""
    import optax

    counted = (optax.ScaleByScheduleState, optax.ScaleByAdamState)
    for leaf in jax.tree.leaves(
        opt_state, is_leaf=lambda x: isinstance(x, counted)
    ):
        if isinstance(leaf, counted):
            return leaf.count
    return None


def _split_params(params, frozen_modules):
    trainable = {k: v for k, v in params.items() if k not in frozen_modules}
    frozen = {k: v for k, v in params.items() if k in frozen_modules}
    return trainable, frozen


def make_train_step(
    texts: jnp.ndarray,
    aug_cfg: AugmentConfig,
    loss_weights: Optional[Dict[str, float]] = None,
    silog_lambd: float = 0.5,
    silog_eps: float = 1e-6,
    grad_accum_steps: int = 1,
    frozen_modules: Tuple[str, ...] = ("backbone", "text_encoder"),
    schedule: Optional[Callable] = None,
) -> Callable:
    """Build the jitted train step: (state, raw_batch, rng) -> (state, metrics).

    `raw_batch` carries undecoded-size arrays: image [B,H,W,3] uint8,
    seg [B,H,W], optional depth [B,H,W] — augmentation runs on device.
    Loss weighting follows `training.loss_weights` (reference
    train_denseclip.py:1093-1096; defaults seg 1.0 / silog 0.1).
    """
    weights = {"seg": 1.0, "silog": 0.1, **(loss_weights or {})}
    crop = tuple(aug_cfg.crop_size)
    texts = jnp.asarray(texts)

    def losses_on(out, batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        parts: Dict[str, jnp.ndarray] = {}
        total = jnp.zeros((), jnp.float32)
        if out.get("seg") is not None and "seg" in batch:
            parts["loss_seg"] = cross_entropy_loss(
                out["seg"], batch["seg"], ignore_index=aug_cfg.ignore_index
            )
            total = total + weights.get("seg", 1.0) * parts["loss_seg"]
        if out.get("depth") is not None and "depth" in batch:
            parts["loss_silog"] = silog_loss(
                out["depth"],
                batch["depth"],
                batch.get("depth_mask"),
                lambd=silog_lambd,
                eps=silog_eps,
            )
            total = total + weights.get("silog", 0.1) * parts["loss_silog"]
        parts["loss_total"] = total
        return total, parts

    def microbatch_grads(state: TrainState, aug: Dict[str, jnp.ndarray], rng):
        trainable, frozen = _split_params(dict(state.params), frozen_modules)

        def loss_fn(trainable_part):
            params = {**trainable_part, **frozen}
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                aug["image"],
                texts,
                train=True,
                gt_hw=crop,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            total, parts = losses_on(out, aug)
            return total, (parts, mutated.get("batch_stats", state.batch_stats))

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (parts, new_stats)), grads = grad_fn(trainable)
        return grads, parts, new_stats

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_aug, rng_drop = jax.random.split(rng)
        aug = augment_batch(rng_aug, batch, aug_cfg)

        if grad_accum_steps == 1:
            grads, parts, new_stats = microbatch_grads(state, aug, rng_drop)
        else:
            b = aug["image"].shape[0]
            assert b % grad_accum_steps == 0, (b, grad_accum_steps)
            micro = jax.tree.map(
                lambda x: x.reshape((grad_accum_steps, b // grad_accum_steps) + x.shape[1:]),
                aug,
            )

            def body(carry, inp):
                grads_acc, parts_acc, stats = carry
                mb, mb_rng = inp
                state_i = state.replace(batch_stats=stats)
                g, p, new_stats = microbatch_grads(state_i, mb, mb_rng)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                parts_acc = jax.tree.map(jnp.add, parts_acc, p)
                return (grads_acc, parts_acc, new_stats), None

            # Every microbatch gets a SPLIT of rng_drop: handing microbatch
            # 0 the parent key alongside its children's streams is a PRNG-
            # hygiene violation (threefry guarantees nothing between a key
            # and its own splits).
            rngs = jax.random.split(rng_drop, grad_accum_steps)
            g0, p0, s0 = microbatch_grads(
                state, jax.tree.map(lambda x: x[0], micro), rngs[0]
            )
            (grads, parts, new_stats), _ = jax.lax.scan(
                body,
                (g0, p0, s0),
                (jax.tree.map(lambda x: x[1:], micro), rngs[1:]),
            )
            inv = 1.0 / grad_accum_steps
            grads = jax.tree.map(lambda x: x * inv, grads)
            parts = jax.tree.map(lambda x: x * inv, parts)

        # Zero-fill frozen branches so tree structures line up; the optimizer
        # routes them to set_to_zero anyway.
        full_grads = dict(grads)
        for k, v in state.params.items():
            if k in frozen_modules:
                full_grads[k] = jax.tree.map(jnp.zeros_like, v)

        finite = jnp.isfinite(parts["loss_total"])
        safe_grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), full_grads
        )
        new_state = state.apply_gradients(safe_grads)
        new_state = new_state.replace(batch_stats=new_stats)
        # Skipped step: keep old params/opt_state AND old batch_stats — a
        # NaN-producing batch must not poison the BN running statistics
        # either — but still advance `step` (the reference advances its
        # batch counter on NaN skip too).
        new_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_state,
            state,
        )
        new_state = new_state.replace(step=state.step + 1)

        metrics = dict(parts)
        metrics["skipped"] = (~finite).astype(jnp.float32)
        if schedule is not None:
            # Report the lr this update actually APPLIES: the optimizer's
            # schedule count advances only on applied updates, while
            # state.step also counts NaN-skipped steps (reverted
            # opt_state) — schedule(state.step) would permanently lead
            # the real lr after any skip.
            count = _applied_schedule_count(state.opt_state)
            metrics["lr"] = schedule(state.step if count is None else count)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(
    texts: jnp.ndarray,
    aug_cfg: AugmentConfig,
    num_classes: int,
    depth_max: float = 80.0,
    resize_to_crop: bool = True,
    silog_lambd: float = 0.5,
) -> Callable:
    """Jitted eval step: (state, batch) -> metric accumulators.

    Follows the reference validate protocol (train_denseclip.py:293-686):
    input resized to crop, predictions resized back to GT resolution,
    confusion-matrix mIoU/acc + depth error suite + val losses — all
    on-device (the reference gathers to rank 0; we let XLA psum).
    """
    texts = jnp.asarray(texts)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray],
             cached_text: Optional[jnp.ndarray] = None):
        # `cached_text`: the image-independent text-tower output, hoisted out
        # of the per-batch program by the caller (validate computes it once
        # per eval epoch — params are constant across the epoch).
        pre = eval_preprocess_batch(batch, aug_cfg, resize_to_crop=resize_to_crop)
        gt_hw = batch["seg"].shape[1:3] if "seg" in batch else batch["image"].shape[1:3]
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            pre["image"],
            texts,
            train=False,
            cached_text=cached_text,
        )
        results: Dict[str, Any] = {}
        if out.get("seg") is not None and "seg" in batch:
            logits = out["seg"]
            if logits.shape[1:3] != tuple(gt_hw):
                logits = jax.image.resize(
                    logits,
                    (logits.shape[0],) + tuple(gt_hw) + (logits.shape[-1],),
                    method="bilinear",
                )
            preds = jnp.argmax(logits, axis=-1)
            results["seg_pred"] = preds.astype(jnp.int32)
            results["confusion"] = confusion_matrix(
                preds, batch["seg"], num_classes, aug_cfg.ignore_index
            )
            results["loss_seg"] = cross_entropy_loss(
                logits, batch["seg"], ignore_index=aug_cfg.ignore_index
            )
        if out.get("depth") is not None and "depth" in batch:
            depth_pred = out["depth"][..., 0]
            if depth_pred.shape[1:3] != tuple(gt_hw):
                depth_pred = jax.image.resize(
                    depth_pred,
                    (depth_pred.shape[0],) + tuple(gt_hw),
                    method="bilinear",
                )
            results["depth_pred"] = depth_pred
            mask = batch["depth"] > 0.0
            sums, count = depth_errors(
                depth_pred, batch["depth"], mask, max_depth=depth_max
            )
            results["depth_sums"] = sums
            results["depth_count"] = count
            results["loss_silog"] = silog_loss(
                depth_pred, batch["depth"], mask, lambd=silog_lambd
            )
        return results

    jitted = jax.jit(step)

    _tb_cache: Dict[str, Callable] = {}

    def text_base(state: TrainState):
        """Run the image-independent text tower once for this state's params
        (fed back as `cached_text`); one compiled program reused across
        validate calls."""
        fn = _tb_cache.get("fn")
        if fn is None:
            apply_fn = state.apply_fn
            fn = jax.jit(
                lambda p, t: apply_fn(
                    {"params": p}, t, method="encode_text_base"
                )
            )
            _tb_cache["fn"] = fn
        return fn(state.params, texts)

    jitted.text_base = text_base
    return jitted
