"""End-to-end convergence: training must IMPROVE held-out accuracy.

The suite's other training tests assert the loss decreases for a few
steps; this one closes the loop the way the reference's real runs do
(train -> validate, train_denseclip.py:911-1491): the learnable synthetic
stream (`SyntheticDataset(learnable=True)` — seg class is a brightness
bucket of the block color, depth a red-channel ramp) gives the model a
real input->label mapping to fit, and the val split uses a DIFFERENT
generator seed, so improving val metrics is generalization, not
memorization.  Uses the shipped make_train_step / make_eval_step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denseclip_vit_multimodal_tpu.data.augment import AugmentConfig
from denseclip_vit_multimodal_tpu.data.synthetic import SyntheticDataset
from denseclip_vit_multimodal_tpu.models.denseclip import (
    CITYSCAPES_CLASSES,
    build_denseclip,
)
from denseclip_vit_multimodal_tpu.train.state import create_train_state
from denseclip_vit_multimodal_tpu.train.step import (
    make_eval_step,
    make_train_step,
)


def _batches(ds, batch_size):
    idx = 0
    while True:
        samples = [ds[(idx + i) % len(ds)] for i in range(batch_size)]
        idx += batch_size
        yield {
            k: jnp.asarray(np.stack([s[k] for s in samples]))
            for k in samples[0]
        }


def _val_metrics(eval_step, state, val_ds, batch_size, n_batches):
    cm = None
    abs_rel_sum = 0.0
    it = _batches(val_ds, batch_size)
    for _ in range(n_batches):
        r = eval_step(state, next(it))
        cm = r["confusion"] if cm is None else cm + r["confusion"]
        abs_rel_sum += float(r["depth_sums"]["abs_rel"]) / max(
            float(r["depth_count"]), 1.0
        )
    cm = np.asarray(cm, np.float64)
    acc = float(np.trace(cm) / max(cm.sum(), 1.0))
    return acc, abs_rel_sum / n_batches


def test_training_improves_heldout_accuracy(tiny_model_cfg):
    model, texts = build_denseclip(tiny_model_cfg, CITYSCAPES_CLASSES)
    crop = (64, 128)
    aug = AugmentConfig(
        crop_size=crop, scale_range=(1.0, 1.0), hflip_prob=0.5
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + crop + (3,)),
        jnp.asarray(texts),
    )
    tcfg = {
        "epochs": 1,
        "optimizer": {"lr": 3e-3, "weight_decay": 0.0},
        "scheduler": {"type": "constant"},
    }
    state = create_train_state(model, variables, tcfg, steps_per_epoch=50)
    train_step = make_train_step(
        texts, aug, loss_weights={"seg": 1.0, "silog": 1.0}
    )
    eval_step = make_eval_step(
        jnp.asarray(texts), AugmentConfig(crop_size=crop), 19
    )

    train_ds = SyntheticDataset(
        length=32, image_size=(64, 128), learnable=True, seed=0
    )
    val_ds = SyntheticDataset(
        length=16, image_size=(64, 128), learnable=True, seed=7919
    )
    b = 8

    acc0, abs_rel0 = _val_metrics(eval_step, state, val_ds, b, 2)

    key = jax.random.PRNGKey(42)
    it = _batches(train_ds, b)
    losses = []
    for i in range(60):
        state, m = train_step(state, next(it), jax.random.fold_in(key, i))
        losses.append(float(m["loss_total"]))

    acc1, abs_rel1 = _val_metrics(eval_step, state, val_ds, b, 2)

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
    # Held-out pixel accuracy must clearly beat both the untrained model
    # and the 1/19 chance level.
    assert acc1 > max(2.0 * acc0, 0.20), (acc0, acc1)
    # Depth improves but SLOWLY by construction: the depth head is a raw
    # linear conv (reference denseclip.py:347 — no output activation), so
    # pixels predicted <= eps sit in the SILog clamp's zero-gradient
    # region on both frameworks.  60 steps measurably drop abs_rel
    # (0.979 -> ~0.91 here); demand a clear monotone improvement, not
    # full convergence.
    assert abs_rel1 < abs_rel0 - 0.03, (abs_rel0, abs_rel1)


def test_learnable_synthetic_mapping_is_deterministic():
    """Same (seed, idx) -> same sample; labels follow the color rule."""
    a = SyntheticDataset(length=4, image_size=(64, 64), learnable=True)[1]
    b = SyntheticDataset(length=4, image_size=(64, 64), learnable=True)[1]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["seg"], b["seg"])
    valid = a["seg"] != 255
    s = a["image"].astype(np.int32).sum(-1)
    want = np.minimum((s * 19) // 766, 18)
    np.testing.assert_array_equal(a["seg"][valid], want[valid])
    # depth: red-channel ramp wherever no hole was punched
    hole_free = a["depth"] > 0
    want_d = 1.0 + a["image"][..., 0].astype(np.float32) / 255.0 * 20.0
    np.testing.assert_allclose(
        a["depth"][hole_free], want_d[hole_free], rtol=1e-6
    )
