"""Tensor-parallel sharding rules on the virtual CPU mesh (dp x tp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from denseclip_vit_multimodal_tpu.data.augment import AugmentConfig
from denseclip_vit_multimodal_tpu.models.denseclip import (
    CITYSCAPES_CLASSES,
    build_denseclip,
)
from denseclip_vit_multimodal_tpu.parallel.mesh import make_mesh, shard_batch
from denseclip_vit_multimodal_tpu.parallel.sharding_rules import (
    param_partition_spec,
    shard_train_state,
    tree_partition_specs,
)
from denseclip_vit_multimodal_tpu.train.state import create_train_state
from denseclip_vit_multimodal_tpu.train.step import make_train_step


def test_partition_spec_rules(tiny_model_cfg):
    model, texts = build_denseclip(tiny_model_cfg, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), jnp.asarray(texts)
    )
    specs = tree_partition_specs(variables["params"])
    blk = specs["backbone"]["transformer"]["blocks"]["block"]
    assert blk["attn"]["qkv"]["kernel"] == P(None, None, "model")
    assert blk["attn"]["out"]["kernel"] == P(None, "model", None)
    assert blk["mlp"]["c_fc"]["kernel"] == P(None, None, "model")
    assert blk["mlp"]["c_proj"]["kernel"] == P(None, "model", None)
    assert blk["ln_1"]["scale"] == P()
    assert specs["contexts"] == P()
    assert specs["backbone"]["patch_embed"] == P()


def test_tp_train_step_matches_dp(tiny_model_cfg):
    """A dp x tp step must produce the same loss as pure dp."""
    model, texts = build_denseclip(tiny_model_cfg, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), jnp.asarray(texts)
    )
    tcfg = {"epochs": 2, "optimizer": {"lr": 1e-3},
            "scheduler": {"type": "constant"}}
    aug = AugmentConfig(crop_size=(32, 64), scale_range=(1.0, 1.0), hflip_prob=0.0)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (8, 64, 128, 3)).astype(np.uint8),
        "seg": rng.randint(0, 19, (8, 64, 128)).astype(np.uint8),
        "depth": rng.uniform(0.1, 80, (8, 64, 128)).astype(np.float32),
    }

    def run(mesh):
        # Fresh buffers per run: the step donates its input state, and
        # device_put may alias rather than copy when shardings match.
        fresh = jax.tree.map(jnp.array, variables)
        state = create_train_state(model, fresh, tcfg, steps_per_epoch=2)
        if "model" in mesh.axis_names:
            state = shard_train_state(state, mesh)
        else:
            state = jax.device_put(
                state, jax.sharding.NamedSharding(mesh, P())
            )
        step = make_train_step(texts, aug)
        sharded = shard_batch(batch, mesh)
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(0))
        return float(metrics["loss_total"]), np.asarray(
            new_state.params["contexts"]
        )

    loss_dp, ctx_dp = run(make_mesh({"data": 8}))
    loss_tp, ctx_tp = run(make_mesh({"data": 4, "model": 2}))
    np.testing.assert_allclose(loss_dp, loss_tp, rtol=1e-4)
    np.testing.assert_allclose(ctx_dp, ctx_tp, rtol=1e-3, atol=1e-6)


def test_tp_param_shards_actually_split(tiny_model_cfg):
    model, texts = build_denseclip(tiny_model_cfg, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), jnp.asarray(texts)
    )
    tcfg = {"epochs": 1, "optimizer": {"lr": 1e-3},
            "scheduler": {"type": "constant"}}
    state = create_train_state(model, variables, tcfg, steps_per_epoch=1)
    mesh = make_mesh({"data": 2, "model": 4})
    state = shard_train_state(state, mesh)
    qkv = state.params["backbone"]["transformer"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    # Each device holds 1/4 of the last dim.
    shard_shape = qkv.sharding.shard_shape(qkv.shape)
    assert shard_shape[-1] == qkv.shape[-1] // 4


def test_opt_state_moments_match_param_shardings(tiny_model_cfg):
    """Adam mu/nu must carry exactly their param's sharding — the old
    (shape, dtype)-keyed matching collided last-wins when two params
    shared shape and dtype with different specs."""
    model, texts = build_denseclip(tiny_model_cfg, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), jnp.asarray(texts)
    )
    tcfg = {"epochs": 1, "optimizer": {"lr": 1e-3},
            "scheduler": {"type": "constant"}}
    state = create_train_state(model, variables, tcfg, steps_per_epoch=1)
    mesh = make_mesh({"data": 2, "model": 4})
    state = shard_train_state(state, mesh)

    param_shardings = {}

    def record(path, leaf):
        key = tuple(str(getattr(p, "key", p)) for p in path)
        param_shardings[key] = leaf.sharding
        return leaf

    jax.tree_util.tree_map_with_path(record, state.params)

    checked = 0

    def check(path, leaf):
        nonlocal checked
        if not hasattr(leaf, "sharding") or getattr(leaf, "ndim", 0) == 0:
            return leaf
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        for i in range(len(keys)):
            if keys[i:] in param_shardings:
                assert leaf.sharding == param_shardings[keys[i:]], keys
                checked += 1
                break
        return leaf

    jax.tree_util.tree_map_with_path(check, state.opt_state)
    # the trainable partition's mu and nu must both have been matched
    n_params = len(jax.tree.leaves(state.params))
    assert checked >= n_params // 2  # at least the trainable subset, x2 moments
