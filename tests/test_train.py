"""Training stack tests: schedules, frozen partitioning, train/eval steps,
checkpoint roundtrip, 8-device mesh execution.

The multi-device tests are the TPU-native analog of "test multi-node without
a cluster" (SURVEY.md §4): the same pjit programs that run on a pod run here
on the virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denseclip_vit_multimodal_tpu.data.augment import AugmentConfig
from denseclip_vit_multimodal_tpu.models.denseclip import (
    CITYSCAPES_CLASSES,
    build_denseclip,
)
from denseclip_vit_multimodal_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)
from denseclip_vit_multimodal_tpu.train.schedules import (
    build_schedule,
    cosine_per_epoch,
    poly_with_warmup,
)
from denseclip_vit_multimodal_tpu.train.state import (
    count_params,
    create_train_state,
    label_params,
    trainable_mask,
)
from denseclip_vit_multimodal_tpu.train.step import make_eval_step, make_train_step


@pytest.fixture(scope="module")
def tiny_setup(tiny_model_cfg):
    model, texts = build_denseclip(tiny_model_cfg, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64, 3), jnp.float32),
        jnp.asarray(texts),
    )
    training_cfg = {
        "epochs": 4,
        "batch_size": 4,
        "optimizer": {"lr": 1e-3, "weight_decay": 0.01},
        "scheduler": {"type": "CosineAnnealingLR", "T_max": 4, "eta_min": 1e-6},
    }
    state = create_train_state(model, variables, training_cfg, steps_per_epoch=2)
    return model, texts, state


def _clone(state):
    """Fresh buffers: train steps donate their input state (donate_argnums)."""
    return jax.tree.map(lambda x: jnp.array(x), state)


def _raw_batch(b=4, h=64, w=128, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.randint(0, 255, (b, h, w, 3), dtype=np.uint8),
        "seg": rng.randint(0, 19, (b, h, w)).astype(np.uint8),
        "depth": rng.uniform(0.1, 80, (b, h, w)).astype(np.float32),
    }


AUG = AugmentConfig(crop_size=(32, 64), scale_range=(0.75, 1.25))


def test_cosine_per_epoch_steps_on_epoch_boundaries():
    sched = cosine_per_epoch(1.0, steps_per_epoch=10, t_max_epochs=4, eta_min=0.0)
    # Constant within an epoch (torch steps the scheduler per epoch,
    # train_denseclip.py:1455).
    assert float(sched(jnp.asarray(0))) == float(sched(jnp.asarray(9))) == 1.0
    assert float(sched(jnp.asarray(10))) < 1.0
    np.testing.assert_allclose(float(sched(jnp.asarray(40))), 0.0, atol=1e-7)


def test_poly_warmup_shape():
    sched = poly_with_warmup(1.0, total_steps=1000, warmup_steps=100)
    assert float(sched(jnp.asarray(0))) < 0.02
    np.testing.assert_allclose(float(sched(jnp.asarray(100))), 0.91, atol=0.02)
    assert float(sched(jnp.asarray(999))) < 0.01


def test_build_schedule_dispatch():
    s = build_schedule(
        {"optimizer": {"lr": 2e-5},
         "scheduler": {"type": "CosineAnnealingLR", "T_max": 10}}, 5)
    assert float(s(jnp.asarray(0))) == pytest.approx(2e-5)
    with pytest.raises(ValueError):
        build_schedule({"scheduler": {"type": "Cyclic"}}, 5)


def test_frozen_labels(tiny_setup):
    _, _, state = tiny_setup
    labels = label_params(state.params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    frozen = {
        jax.tree_util.keystr(p) for p, l in flat if l == "frozen"
    }
    assert any("backbone" in k for k in frozen)
    assert any("text_encoder" in k for k in frozen)
    mask = trainable_mask(state.params)
    # The learnable prompt must be trainable ('gamma' only exists when a
    # context decoder is configured; the tiny config has none).
    assert mask["contexts"] is True
    assert not any(jax.tree.leaves(mask["backbone"]))
    assert not any(jax.tree.leaves(mask["text_encoder"]))
    assert all(jax.tree.leaves(mask["decode_head"]))


def test_train_step_updates_only_trainable(tiny_setup):
    _, texts, state = tiny_setup
    state = _clone(state)
    step = make_train_step(texts, AUG)
    batch = jax.tree.map(jnp.asarray, _raw_batch())
    # Copy initial params before the donated buffer is consumed.
    before = jax.tree.map(np.asarray, state.params)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["skipped"]) == 0.0
    assert int(new_state.step) == 1
    after = jax.tree.map(np.asarray, new_state.params)
    # Frozen towers unchanged.
    for tower in ("backbone", "text_encoder"):
        same = jax.tree.map(np.array_equal, before[tower], after[tower])
        assert all(jax.tree.leaves(same)), f"{tower} changed"
    # Prompt contexts and heads moved.
    assert not np.array_equal(before["contexts"], after["contexts"])
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(a, b),
        before["decode_head"], after["decode_head"],
    )
    assert any(jax.tree.leaves(changed))


def test_train_step_loss_decreases(tiny_setup):
    _, texts, state = tiny_setup
    state = _clone(state)
    step = make_train_step(texts, AUG)
    batch = jax.tree.map(jnp.asarray, _raw_batch())
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss_total"]))
    assert losses[-1] < losses[0], losses


def test_grad_accum_matches_full_batch(tiny_model_cfg):
    """Microbatched gradients track the full-batch gradient.

    Not bit-equal: BN statistics and CE valid-pixel weighting are
    per-microbatch (as in the reference's accumulation,
    train_denseclip.py:1154); tolerances bound the scale instead.  Head
    dropout is disabled for the comparison — different microbatch shapes
    draw different masks, which is dropout variance, not accumulation
    error.
    """
    import copy

    cfg = copy.deepcopy(dict(tiny_model_cfg))
    cfg["decode_head"]["dropout_ratio"] = 0.0
    cfg["depth_head"]["dropout_ratio"] = 0.0
    model, texts = build_denseclip(cfg, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64, 3), jnp.float32),
        jnp.asarray(texts),
    )
    training_cfg = {
        "epochs": 4,
        "batch_size": 4,
        "optimizer": {"lr": 1e-3, "weight_decay": 0.01},
        "scheduler": {"type": "CosineAnnealingLR", "T_max": 4, "eta_min": 1e-6},
    }
    state = create_train_state(model, variables, training_cfg, steps_per_epoch=2)
    aug = AugmentConfig(crop_size=(32, 64), scale_range=(1.0, 1.0), hflip_prob=0.0)
    batch = jax.tree.map(jnp.asarray, _raw_batch(b=4))
    s1, m1 = make_train_step(texts, aug)(_clone(state), batch, jax.random.PRNGKey(0))
    s2, m2 = make_train_step(texts, aug, grad_accum_steps=2)(
        _clone(state), batch, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        float(m1["loss_total"]), float(m2["loss_total"]), rtol=5e-2
    )
    # Adam updates are bounded by lr=1e-3; similar grads -> similar params.
    np.testing.assert_allclose(
        np.asarray(s1.params["contexts"]),
        np.asarray(s2.params["contexts"]),
        atol=2.1e-3,
    )


def test_eval_step_metrics(tiny_setup):
    _, texts, state = tiny_setup
    eval_step = make_eval_step(texts, AUG, num_classes=19)
    raw = _raw_batch(b=2)
    raw["seg"][:, :8] = 255  # an ignore region the confusion MUST exclude
    batch = jax.tree.map(jnp.asarray, raw)
    res = eval_step(state, batch)
    cm = np.asarray(res["confusion"])
    assert cm.shape == (19, 19)
    valid_px = (np.asarray(batch["seg"]) != 255).sum()
    assert valid_px < np.asarray(batch["seg"]).size  # ignore path exercised
    np.testing.assert_allclose(cm.sum(), valid_px, rtol=1e-6)
    assert float(res["depth_count"]) > 0
    assert np.isfinite(float(res["loss_seg"]))


def test_train_step_on_8device_mesh(tiny_setup):
    _, texts, state = tiny_setup
    mesh = make_mesh({"data": 8})
    state = replicate(_clone(state), mesh)
    step = make_train_step(texts, AUG)
    batch = shard_batch(_raw_batch(b=8), mesh)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_total"]))
    # Params remain replicated and identical across devices.
    ctx = new_state.params["contexts"]
    assert ctx.sharding.is_fully_replicated


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    _, texts, state = tiny_setup
    from denseclip_vit_multimodal_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    step = make_train_step(texts, AUG)
    batch = jax.tree.map(jnp.asarray, _raw_batch())
    trained, _ = step(_clone(state), batch, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), trained, epoch=3, best_metric=0.5, is_best=True)
    restored, epoch, best = restore_checkpoint(str(tmp_path), state)
    assert epoch == 3 and best == pytest.approx(0.5)
    np.testing.assert_array_equal(
        np.asarray(restored.params["contexts"]),
        np.asarray(trained.params["contexts"]),
    )
    assert int(restored.step) == int(trained.step)
    import os
    base = os.path.join(str(tmp_path), "checkpoints")
    assert set(os.listdir(base)) >= {"epoch_3", "latest", "best"}


def test_poisoned_depth_batch_is_masked_not_skipped(tiny_setup):
    """Bad DATA never reaches the loss: inf/NaN depth pixels die in the
    resample + validity mask (depth > 0 is False for NaN), so the step
    stays finite and is NOT skipped — the data plane's failure handling."""
    _, texts, state = tiny_setup
    step = make_train_step(texts, AUG)
    bad = dict(_raw_batch())
    bad["depth"] = np.full_like(bad["depth"], np.inf)
    _, metrics = step(_clone(state), jax.tree.map(jnp.asarray, bad),
                      jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["skipped"]) == 0.0


def test_nan_batch_skips_update(tiny_setup):
    """A non-finite loss (here: a NaN-poisoned trainable param, the way a
    real numerical blowup presents) must skip the update: params,
    opt_state AND batch_stats keep their pre-step values while the step
    counter advances (reference NaN-skip, train_denseclip.py:1323-1324)."""
    _, texts, state = tiny_setup
    step = make_train_step(texts, AUG)
    batch = _raw_batch()
    bad_state = _clone(state)
    # poison a param that FEEDS the loss (the score map — and thus
    # `contexts` — is computed but unconsumed at score_concat_index=-1,
    # the reference ViT config's own quirk)
    bad_state = bad_state.replace(params={
        **bad_state.params,
        "decode_head": jax.tree.map(
            lambda x: jnp.full_like(x, jnp.nan),
            bad_state.params["decode_head"],
        ),
    })
    before = np.asarray(bad_state.params["contexts"])
    stats_before = jax.tree.map(np.asarray, bad_state.batch_stats)
    new_state, metrics = step(bad_state, jax.tree.map(jnp.asarray, batch),
                              jax.random.PRNGKey(0))
    # precondition asserted UNCONDITIONALLY — an earlier version poisoned
    # the depth batch, which the validity mask absorbs, and the whole test
    # passed vacuously behind an `if not isfinite` guard
    assert not np.isfinite(float(metrics["loss_total"])), (
        "expected NaN params to produce a non-finite loss"
    )
    assert float(metrics["skipped"]) == 1.0
    np.testing.assert_array_equal(
        np.asarray(new_state.params["contexts"]), before
    )
    # the skipped step must not poison BN running statistics either
    jax.tree.map(
        lambda old, new: np.testing.assert_array_equal(old, np.asarray(new)),
        stats_before, new_state.batch_stats,
    )
    assert int(new_state.step) == 1  # counter still advances


def test_async_checkpoint_roundtrip(tiny_setup, tmp_path):
    """async_save returns immediately; after wait_for_pending_saves the
    checkpoint is durable and restores identically (training.async_checkpoint
    opt-in — serialization overlaps the next steps)."""
    import os

    from denseclip_vit_multimodal_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
        wait_for_pending_saves,
    )

    _, texts, state = tiny_setup
    save_checkpoint(str(tmp_path), state, epoch=1, best_metric=0.7,
                    is_best=True, async_save=True)
    wait_for_pending_saves()
    restored, epoch, best = restore_checkpoint(str(tmp_path), state)
    assert epoch == 1 and best == pytest.approx(0.7)
    np.testing.assert_array_equal(
        np.asarray(restored.params["contexts"]),
        np.asarray(state.params["contexts"]),
    )
    base = os.path.join(str(tmp_path), "checkpoints")
    assert set(os.listdir(base)) >= {"epoch_1", "latest", "best"}
    # async aliases are atomic symlinks to the one written epoch dir
    # (queuing three full copies would block on each other's commit)
    assert os.path.islink(os.path.join(base, "latest"))
    assert os.readlink(os.path.join(base, "latest")) == "epoch_1"
    # restore through the `best` alias too
    _, epoch_b, _ = restore_checkpoint(str(tmp_path), state, which="best")
    assert epoch_b == 1
    # a later SYNC save uses the same alias scheme (one serialization,
    # symlink repoint — r5: the old sync path re-serialized the payload
    # once per alias) without clobbering the epoch dir it pointed at
    save_checkpoint(str(tmp_path), state, epoch=2, best_metric=0.7)
    assert os.readlink(os.path.join(base, "latest")) == "epoch_2"
    _, epoch2, _ = restore_checkpoint(str(tmp_path), state)
    assert epoch2 == 2
    assert os.path.isdir(os.path.join(base, "epoch_1"))  # still intact


def test_load_params_only_across_optimizer_types(tiny_setup, tmp_path):
    """--load warm-starts weights from a run with a DIFFERENT optimizer
    (SGD checkpoint -> AdamW run): the read must be template-free so an
    opt_state tree mismatch cannot abort it (r5 review fix) — the
    cross-config warm start is exactly what --load exists for (reference
    train_denseclip.py:1012-1034 loads weights only)."""
    from denseclip_vit_multimodal_tpu.models.denseclip import build_denseclip
    from denseclip_vit_multimodal_tpu.train.checkpoint import (
        load_params_only,
        save_checkpoint,
    )
    from denseclip_vit_multimodal_tpu.train.state import create_train_state

    model, texts, adamw_state = tiny_setup
    variables = {
        "params": adamw_state.params,
        "batch_stats": adamw_state.batch_stats,
    }
    sgd_state = create_train_state(
        model, variables,
        {
            "epochs": 4,
            "optimizer": {"type": "SGD", "lr": 1e-2, "momentum": 0.9,
                          "weight_decay": 1e-4},
            "scheduler": {"type": "CosineAnnealingLR", "T_max": 4},
        },
        steps_per_epoch=2,
    )
    save_checkpoint(str(tmp_path), sgd_state, epoch=0)

    warm = load_params_only(str(tmp_path), adamw_state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        warm.params, sgd_state.params,
    )
    # optimizer/scheduler state stays THIS run's (fresh AdamW)
    assert jax.tree_util.tree_structure(
        warm.opt_state
    ) == jax.tree_util.tree_structure(adamw_state.opt_state)
    assert int(warm.step) == int(adamw_state.step)


def test_async_crash_window_protections(tiny_setup, tmp_path):
    """(a) The prune must never delete the directory `best` pointed at
    BEFORE an async repoint (the new dir's commit may still be in flight);
    (b) restoring through a dangling alias (async save interrupted before
    commit) raises a clear error instead of an orbax stack trace."""
    import os
    import shutil

    from denseclip_vit_multimodal_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
        wait_for_pending_saves,
    )

    _, texts, state = tiny_setup
    save_checkpoint(str(tmp_path), state, epoch=0, best_metric=0.9,
                    is_best=True, async_save=True)
    # many later epochs push epoch_0 out of the keep window; it must
    # survive every prune because an alias points (or pointed) at it
    for e in range(1, 4):
        save_checkpoint(str(tmp_path), state, epoch=e, best_metric=0.1,
                        keep=2, async_save=True)
    wait_for_pending_saves()
    base = os.path.join(str(tmp_path), "checkpoints")
    assert os.path.isdir(os.path.join(base, "epoch_0"))  # pinned by `best`
    # the moment `best` is repointed to a NEW epoch, the OLD target must
    # still survive THAT call's prune (its commit may be pending)
    save_checkpoint(str(tmp_path), state, epoch=4, best_metric=0.95,
                    is_best=True, keep=2, async_save=True)
    assert os.path.isdir(os.path.join(base, "epoch_0"))
    wait_for_pending_saves()

    # dangling alias: simulate an interrupted commit
    shutil.rmtree(os.path.join(base, "epoch_4"))
    with pytest.raises(FileNotFoundError, match="dangles"):
        restore_checkpoint(str(tmp_path), state, which="best")


def test_sgd_matches_torch_sgd_semantics():
    """`build_optimizer(opt_type='sgd')` mirrors `torch.optim.SGD` exactly:
    COUPLED weight decay added to the gradient BEFORE the momentum buffer
    (applied to every leaf, unlike AdamW's masked decoupled decay) and
    `buf = momentum*buf + g; p -= lr*buf` (reference trainer's second
    optimizer choice, train_denseclip.py:1062).  8 steps on a non-trivial
    quadratic, bitwise-tight tolerance.
    """
    torch = pytest.importorskip("torch")
    from denseclip_vit_multimodal_tpu.train.state import build_optimizer

    LR, WD, MOM, N = 1e-2, 0.05, 0.9, 8
    rng = np.random.RandomState(3)
    w0 = rng.randn(4, 5).astype(np.float32)
    b0 = rng.randn(5).astype(np.float32)
    targets = [rng.randn(4, 5).astype(np.float32) for _ in range(N)]

    # torch side
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.SGD([tw, tb], lr=LR, momentum=MOM, weight_decay=WD)
    for t in targets:
        opt.zero_grad()
        loss = ((tw - torch.from_numpy(t)) ** 2).sum() + (tb ** 2).sum()
        loss.backward()
        opt.step()

    # our side: the production builder with a matching constant schedule
    params = {"m": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = build_optimizer(
        params, lambda step: LR, weight_decay=WD, opt_type="SGD",
        momentum=MOM, frozen_modules=(),
    )
    import optax

    state = tx.init(params)
    for t in targets:
        grads = jax.grad(
            lambda p: jnp.sum((p["m"]["kernel"] - jnp.asarray(t)) ** 2)
            + jnp.sum(p["m"]["bias"] ** 2)
        )(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["m"]["kernel"]), tw.detach().numpy(),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(params["m"]["bias"]), tb.detach().numpy(),
        rtol=1e-6, atol=1e-7,
    )


def test_sgd_momentumless_and_bad_type():
    """SGD with momentum 0 / wd 0 is plain gradient descent; unknown
    optimizer types are rejected (the reference raises too,
    train_denseclip.py:1063)."""
    import optax

    from denseclip_vit_multimodal_tpu.train.state import build_optimizer

    params = {"m": {"kernel": jnp.ones((2, 2))}}
    tx = build_optimizer(params, lambda s: 0.5, weight_decay=0.0,
                         opt_type="sgd", momentum=0.0, frozen_modules=())
    grads = {"m": {"kernel": jnp.full((2, 2), 2.0)}}
    updates, _ = tx.update(grads, tx.init(params), params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["m"]["kernel"]),
                               np.full((2, 2), 0.0), atol=1e-7)

    with pytest.raises(ValueError, match="Unsupported optimizer"):
        build_optimizer(params, lambda s: 0.5, opt_type="rmsprop")
