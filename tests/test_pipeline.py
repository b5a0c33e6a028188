"""GPipe pipeline parallelism on the virtual 8-device CPU mesh.

The pipeline (parallel/pipeline.py) must be value-identical to the plain
`nn.scan` stack — same taps, same gradients — while sharding the layer axis
over a `pipe` mesh axis and composing with a `data` axis.  The reference has
no pipeline parallelism (SURVEY.md §2.8: DDP only); these tests pin the
beyond-reference contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denseclip_vit_multimodal_tpu.parallel.mesh import make_mesh
from denseclip_vit_multimodal_tpu.parallel.pipeline import (
    activate_pipeline,
    current_pipeline,
    pipeline_blocks,
    pipeline_from_config,
)


# ---------------------------------------------------------------- pure core


def _toy():
    L, B, N, D = 8, 4, 6, 16
    rng = np.random.RandomState(0)
    params = (
        jnp.asarray(rng.randn(L, D, D) * 0.2, jnp.float32),
        jnp.asarray(rng.randn(L, D) * 0.1, jnp.float32),
    )
    x = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    rates = jnp.linspace(0.0, 0.5, L)

    def block_apply(p, h, aux, mb_idx=0):
        w, b = p
        return jnp.tanh(h @ w + b + aux)

    def ref_taps(params, x):
        def body(c, inp):
            p, a = inp
            y = block_apply(p, c, a)
            return y, y

        _, taps = jax.lax.scan(body, x, (params, rates))
        return taps

    return params, x, rates, block_apply, ref_taps


@pytest.mark.parametrize(
    "spec,mb",
    [
        ({"pipe": 4, "data": 2}, 2),
        ({"data": 2, "pipe": 4}, 4),  # axis order must not matter
        ({"pipe": 2, "data": 4}, 4),
        ({"pipe": 8}, 4),  # pipe-only mesh
    ],
)
def test_core_matches_scan(spec, mb):
    params, x, rates, block_apply, ref_taps = _toy()
    mesh = make_mesh(spec)
    taps = jax.jit(
        lambda p, xx: pipeline_blocks(
            block_apply, p, xx, rates, mesh, microbatches=mb
        )
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(taps), np.asarray(ref_taps(params, x)), rtol=1e-6, atol=1e-6
    )


def test_core_gradients_match_scan():
    params, x, rates, block_apply, ref_taps = _toy()
    mesh = make_mesh({"pipe": 4, "data": 2})

    def loss_pipe(p, xx):
        t = pipeline_blocks(block_apply, p, xx, rates, mesh, microbatches=2)
        return (t[-1] ** 2).sum() + t.sum()

    def loss_ref(p, xx):
        t = ref_taps(p, xx)
        return (t[-1] ** 2).sum() + t.sum()

    g_pipe = jax.jit(jax.grad(loss_pipe))(params, x)
    g_ref = jax.jit(jax.grad(loss_ref))(params, x)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_core_rejects_indivisible():
    params, x, rates, block_apply, _ = _toy()
    mesh = make_mesh({"pipe": 4, "data": 2})
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(block_apply, params, x, rates, mesh, microbatches=3)
    mesh3 = make_mesh({"pipe": 2, "data": 4})
    bad = jax.tree.map(lambda a: a[:7], params)  # 7 layers over 2 stages
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(block_apply, bad, x, rates[:7], mesh3)


# ----------------------------------------------------------- context plumbing


def test_context_activation_and_one_stage_noop():
    mesh = make_mesh({"pipe": 2, "data": 4})
    assert current_pipeline() is None
    with activate_pipeline(mesh, microbatches=2):
        ctx = current_pipeline()
        assert ctx is not None and ctx.stages == 2 and ctx.microbatches == 2
    assert current_pipeline() is None
    # a 1-stage pipe axis degrades to the plain scan
    mesh1 = make_mesh({"pipe": 1, "data": 8})
    with activate_pipeline(mesh1):
        assert current_pipeline() is None


def test_pipeline_from_config():
    mesh = make_mesh({"pipe": 2, "data": 4})
    with pipeline_from_config({"pipeline": {"microbatches": 4}}, mesh):
        assert current_pipeline().microbatches == 4
    with pipeline_from_config({}, mesh):
        assert current_pipeline() is None  # no pipeline: section
    with pipeline_from_config({"pipeline": {}}, make_mesh({"data": 8})):
        assert current_pipeline() is None  # mesh has no pipe axis


def test_enable_pipeline_rebinds_and_clears():
    from denseclip_vit_multimodal_tpu.parallel.pipeline import (
        enable_pipeline_from_config,
    )

    mesh = make_mesh({"pipe": 2, "data": 4})
    assert enable_pipeline_from_config({"pipeline": {}}, mesh)
    assert current_pipeline().stages == 2
    mesh2 = make_mesh({"pipe": 4, "data": 2})
    assert enable_pipeline_from_config({"pipeline": {"microbatches": 8}}, mesh2)
    ctx = current_pipeline()
    assert ctx.stages == 4 and ctx.microbatches == 8  # rebound, not stale
    assert not enable_pipeline_from_config({}, mesh)  # clears
    assert current_pipeline() is None


def test_pipeline_dropout_masks_differ_across_microbatches():
    """Identical samples routed through different microbatches must get
    different stochastic-depth draws (the per-layer key is folded with the
    microbatch index) — otherwise regularization is systematically
    correlated across the batch."""
    tf = _transformer(layers=4, drop_path_rate=0.9)
    one = jax.random.normal(jax.random.PRNGKey(7), (1, 10, 32), jnp.float32)
    x = jnp.concatenate([one, one, one, one], axis=0)  # 4 identical samples
    variables = tf.init(jax.random.PRNGKey(0), x)
    mesh = make_mesh({"pipe": 2, "data": 4})
    with activate_pipeline(mesh, microbatches=4):  # 1 sample per microbatch
        out, _ = jax.jit(
            lambda v, xx: tf.apply(
                v, xx, deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)}
            )
        )(variables, x)
    out = np.asarray(out)
    deltas = [
        float(np.abs(out[i] - out[j]).max())
        for i in range(4)
        for j in range(i + 1, 4)
    ]
    assert max(deltas) > 0.0, "all microbatches drew identical drop masks"


# ------------------------------------------------------- transformer parity


def _transformer(layers=4, causal=False, drop_path_rate=0.0):
    from denseclip_vit_multimodal_tpu.models.layers import Transformer

    return Transformer(
        width=32, layers=layers, heads=4, causal=causal, attn_impl="xla",
        drop_path_rate=drop_path_rate,
    )


def test_transformer_pipeline_matches_scan():
    tf = _transformer()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 32), jnp.float32)
    variables = tf.init(jax.random.PRNGKey(0), x)
    final_ref, taps_ref = jax.jit(tf.apply)(variables, x)

    mesh = make_mesh({"pipe": 4, "data": 2})
    with activate_pipeline(mesh, microbatches=2):
        final, taps = jax.jit(tf.apply)(variables, x)
    np.testing.assert_allclose(
        np.asarray(taps), np.asarray(taps_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(final), np.asarray(final_ref), rtol=1e-5, atol=1e-5
    )


def test_transformer_pipeline_gradients_match():
    tf = _transformer()
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 10, 32), jnp.float32)
    variables = tf.init(jax.random.PRNGKey(0), x)
    mesh = make_mesh({"pipe": 2, "data": 4})

    def loss(v, xx):
        final, taps = tf.apply(v, xx)
        return (final**2).sum() + taps.sum()

    g_ref = jax.jit(jax.grad(loss))(variables, x)
    with activate_pipeline(mesh):
        g_pipe = jax.jit(jax.grad(loss))(variables, x)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )


def test_transformer_falls_back_when_indivisible():
    """Wrong layer/batch divisibility silently uses the plain scan (the text
    towers' class-count batch must not crash a pipelined vision run)."""
    tf = _transformer(layers=4)
    x3 = jax.random.normal(jax.random.PRNGKey(3), (3, 10, 32), jnp.float32)
    variables = tf.init(jax.random.PRNGKey(0), x3)
    final_ref, _ = jax.jit(tf.apply)(variables, x3)
    mesh = make_mesh({"pipe": 2, "data": 4})
    with activate_pipeline(mesh):  # batch 3 % microbatches 2 != 0
        final, _ = jax.jit(tf.apply)(variables, x3)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final_ref), rtol=1e-6)

    tf3 = _transformer(layers=3)  # 3 layers % 2 stages != 0
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 10, 32), jnp.float32)
    v3 = tf3.init(jax.random.PRNGKey(0), x)
    ref3, _ = jax.jit(tf3.apply)(v3, x)
    with activate_pipeline(mesh):
        out3, _ = jax.jit(tf3.apply)(v3, x)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3), rtol=1e-6)


def test_fallback_warns_replicated_compute():
    """Divisibility fallback on a NON-causal stack must warn — a silent
    fallback burns stages x redundant compute with no signal."""
    from denseclip_vit_multimodal_tpu.models import layers as layers_mod

    layers_mod._PIPELINE_FALLBACK_WARNED.clear()
    tf = _transformer(layers=5)  # 5 % 2 stages != 0
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 10, 32), jnp.float32)
    variables = tf.init(jax.random.PRNGKey(0), x)
    with activate_pipeline(make_mesh({"pipe": 2, "data": 4})):
        with pytest.warns(UserWarning, match="REPLICATED"):
            tf.apply(variables, x)
    # causal stacks fall back silently by design (text towers)
    layers_mod._PIPELINE_FALLBACK_WARNED.clear()
    tfc = _transformer(layers=5, causal=True)
    vc = tfc.init(jax.random.PRNGKey(0), x)
    import warnings as _w

    with activate_pipeline(make_mesh({"pipe": 2, "data": 4})):
        with _w.catch_warnings():
            _w.simplefilter("error")
            tfc.apply(vc, x)


def test_data_axis_process_locality_check(monkeypatch):
    """{pipe: 2, data: 4} over >1 process replicates the batch per process —
    the loader contract check must reject it (train/loop.py raises)."""
    from denseclip_vit_multimodal_tpu.parallel.mesh import (
        data_axis_is_process_local,
    )

    mesh = make_mesh({"pipe": 2, "data": 4})
    assert data_axis_is_process_local(mesh)  # single-process: trivially ok
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert not data_axis_is_process_local(mesh)


def test_causal_stack_never_pipelines():
    """Text towers (causal) keep the scan even under an active pipeline."""
    tf = _transformer(causal=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 10, 32), jnp.float32)
    variables = tf.init(jax.random.PRNGKey(0), x)
    ref, _ = jax.jit(tf.apply)(variables, x)
    with activate_pipeline(make_mesh({"pipe": 4, "data": 2})):
        out, _ = jax.jit(tf.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


# ---------------------------------------------------------- train-step


def test_pp_train_step_matches_dp(tiny_model_cfg):
    """A dp x pp (and dp x tp x pp) train step must produce the same loss
    and updates as pure dp — the pipeline is a layout change, not a math
    change."""
    from denseclip_vit_multimodal_tpu.data.augment import AugmentConfig
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        CITYSCAPES_CLASSES,
        build_denseclip,
    )
    from denseclip_vit_multimodal_tpu.parallel.mesh import shard_batch
    from denseclip_vit_multimodal_tpu.parallel.sharding_rules import (
        shard_train_state,
    )
    from denseclip_vit_multimodal_tpu.train.state import create_train_state
    from denseclip_vit_multimodal_tpu.train.step import make_train_step
    from jax.sharding import NamedSharding, PartitionSpec as SP

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

    def run(mesh, pipelined):
        fresh = jax.tree.map(jnp.array, variables)
        state = create_train_state(model, fresh, tcfg, steps_per_epoch=2)
        if "model" in mesh.axis_names:
            state = shard_train_state(state, mesh)
        else:
            state = jax.device_put(state, NamedSharding(mesh, SP()))
        step = make_train_step(texts, aug)
        sharded = shard_batch(batch, mesh)
        if pipelined:
            with activate_pipeline(mesh):
                new_state, metrics = step(state, sharded, jax.random.PRNGKey(0))
        else:
            new_state, metrics = step(state, sharded, jax.random.PRNGKey(0))
        return float(metrics["loss_total"]), np.asarray(
            new_state.params["contexts"]
        )

    loss_dp, ctx_dp = run(make_mesh({"data": 8}), pipelined=False)
    loss_pp, ctx_pp = run(make_mesh({"data": 4, "pipe": 2}), pipelined=True)
    np.testing.assert_allclose(loss_dp, loss_pp, rtol=1e-4)
    np.testing.assert_allclose(ctx_dp, ctx_pp, rtol=1e-3, atol=1e-6)
    loss_3d, ctx_3d = run(
        make_mesh({"data": 2, "model": 2, "pipe": 2}), pipelined=True
    )
    np.testing.assert_allclose(loss_dp, loss_3d, rtol=1e-4)
    np.testing.assert_allclose(ctx_dp, ctx_3d, rtol=1e-3, atol=1e-6)


# ------------------------------------------------------------ model-level


def test_vit_backbone_pipelined_forward(tiny_model_cfg):
    """Full CLIPVisionTransformer under an active dp x pp mesh: same taps."""
    from denseclip_vit_multimodal_tpu.models.vit import CLIPVisionTransformer

    b = tiny_model_cfg["backbone"]
    vit = CLIPVisionTransformer(
        patch_size=b["patch_size"],
        width=b["width"],
        layers=b["layers"],
        heads=b["heads"],
        input_resolution=b["input_resolution"],
        out_indices=tuple(b["out_indices"]),
        attn_impl="xla",
    )
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 32, 64, 3), jnp.float32)
    variables = vit.init(jax.random.PRNGKey(0), x)
    ref = jax.jit(vit.apply)(variables, x)
    mesh = make_mesh({"data": 2, "pipe": 4})
    with activate_pipeline(mesh, microbatches=2):
        out = jax.jit(vit.apply)(variables, x)
    assert len(out) == len(ref)
    for a, b_ in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5
        )
