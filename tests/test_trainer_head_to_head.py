"""HEAD-TO-HEAD executed trainer parity: the reference's ACTUAL
`train_worker` vs our `train/loop.py::train`, run side by side.

This is the last reference surface that previously had only decomposed
evidence (composite fwd/bwd parity, multi-step AdamW trajectory parity,
schedule unit tests): here the reference's 615-LoC training function
(/root/reference/segmentation/train_denseclip.py:911-1526 — runtime import,
no code copied) and our production `train()` each drive ONE epoch of FIVE
identical batches from transplanted-identical weights, and we assert

  * the per-step loss sequences agree (seg CE, SILog, weighted total —
    captured from the reference through its own TensorBoard writer calls,
    train_denseclip.py:1368-1378, and from ours through the train-step
    metrics), and
  * the post-training parameters agree leaf-by-leaf on every live branch,
    read back from each trainer's own checkpoint format (the reference's
    `checkpoints/epoch_1.pth`, train_denseclip.py:1492-1517; our Orbax
    `latest`).

Both trainers run their REAL code paths: the reference builds its model
from the config, loads the injected `state_dict`, freezes backbone +
text_encoder (:1040-1049), builds SGD(momentum) + CosineAnnealingLR
(:1057-1083; see _shared_training_cfg for why not AdamW here),
CrossEntropyLoss(ignore_index)/SILogLoss (:1086-1091), steps per batch and
saves its checkpoint; ours goes through config -> mesh -> create_train_state
-> make_train_step -> checkpoint.  Only the DATA entry points are
monkeypatched so both sides see byte-identical batches (albumentations is
absent in this environment; the reference loader is fed pre-normalized
tensors computed with the same mean/std formula our on-device augmentation
uses, and our augmentation is configured identity: crop == frame size,
scale 1.0, no flip, no jitter).

Determinism ground rules (documented divergences, normalized on both sides):
  * dropout OFF: cross-framework dropout RNG streams cannot be aligned.
    Ours is configured to 0; the reference hard-codes Dropout(0.1) inside
    torchvision's FCNHead (denseclip.py:305-309, 343-348), so
    `torch.nn.functional.dropout` is identity-patched for the run.
  * weight_decay 0: the raw reference decays EVERY optimized parameter
    (one flat param list, :1040-1062) while our production optimizer masks
    decay to ndim>1 weights; that semantic difference is pinned separately
    by test_multistep_optimizer_trajectory_parity (which mirrors our mask
    into torch param groups).
  * the text-tower double-apply bug (models.py:305-307) is patched to
    single-pass, as in every other parity suite in this repo.
"""

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

REF_PATH = "/root/reference/segmentation"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PATH), reason="reference repo not mounted"
)

torch = pytest.importorskip("torch")
pytest.importorskip("regex")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_composite_parity import (  # noqa: E402
    EMBED,
    FIXED_CTX,
    MODEL_CFG,
    TXT_W,
    _install_torchvision_stub,
    ref_pkg,  # noqa: F401  (fixture re-export: patches + stubs active)
)

N_STEPS = 5
BATCH = 8  # divisible by the conftest's 8-device data mesh
H, W = 32, 48
LR = 1e-4  # SGD: raw-gradient steps (SILog grads at init are large)
LIVE = ("vis_proj", "global_proj", "neck", "decode_head", "depth_head",
        "contexts", "gamma", "context_decoder")
NORM_MEAN = (0.48145466, 0.4578275, 0.40821073)
NORM_STD = (0.26862954, 0.26130258, 0.27577711)


def _model_cfg_no_dropout():
    cfg = {k: dict(v) for k, v in MODEL_CFG.items()}
    cfg["context_decoder"]["dropout"] = 0.0
    # our heads honor dropout_ratio; the reference's torchvision FCNHead
    # ignores unknown keys (denseclip.py:305-309 reads channels only) and
    # its hard-coded Dropout(0.1) is identity-patched in the fixture below
    cfg["decode_head"]["dropout_ratio"] = 0.0
    cfg["depth_head"]["dropout_ratio"] = 0.0
    return cfg


@pytest.fixture(scope="module")
def ref_train_mod(ref_pkg):  # noqa: F811 — fixture dependency by name
    """Import the reference's actual training script as a module.

    Depends on ref_pkg so the torchvision stub and the single-pass
    Transformer patch are in place for the model train_worker builds.

    The reference's `datasets/` directory has no __init__.py, so as a
    namespace package it loses the import race to site-packages'
    HuggingFace `datasets`; a synthetic parent module pointed at the
    reference directory is installed for the fixture's lifetime.
    """
    _install_torchvision_stub()
    saved = {
        k: sys.modules.get(k)
        for k in ("datasets", "datasets.ade20k", "datasets.cityscapes",
                  "datasets.cityscapes_depth_seg")
    }
    ds_pkg = types.ModuleType("datasets")
    ds_pkg.__path__ = [os.path.join(REF_PATH, "datasets")]
    sys.modules["datasets"] = ds_pkg
    for k in list(saved):
        if k != "datasets" and k in sys.modules:
            del sys.modules[k]
    sys.path.insert(0, REF_PATH)
    try:
        import train_denseclip as ref_train
    finally:
        sys.path.remove(REF_PATH)
    yield ref_train
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def _make_batches():
    """Five fixed batches: uint8 frames + int seg (with ignore pixels) +
    float depth (with invalid zero pixels, mask = depth > 0 as in
    data/augment.py:427 and the reference dataset's valid-depth mask)."""
    rng = np.random.RandomState(123)
    batches = []
    for i in range(N_STEPS):
        img = rng.randint(0, 255, (BATCH, H, W, 3), dtype=np.uint8)
        seg = rng.randint(0, 19, (BATCH, H, W)).astype(np.int32)
        seg[:, :3] = 255  # exercise CE ignore_index
        depth = rng.uniform(0.5, 10.0, (BATCH, H, W)).astype(np.float32)
        depth[:, -2:] = 0.0  # invalid depth -> masked out of SILog
        batches.append({"image": img, "seg": seg, "depth": depth})
    return batches


def _normalize_host(img_u8):
    """Host-side copy of data/augment.py::normalize_image's formula."""
    x = img_u8.astype(np.float32) / 255.0
    return ((x - np.asarray(NORM_MEAN, np.float32))
            / np.asarray(NORM_STD, np.float32)).astype(np.float32)


def _shared_training_cfg():
    return {
        "epochs": 1,
        "batch_size": BATCH,
        "workers": 0,
        "seed": 0,
        # SGD+momentum (config-level on BOTH trainers — the reference's
        # second production optimizer, train_denseclip.py:1062; ours is
        # state.py::build_optimizer opt_type=sgd).  AdamW is numerically
        # un-comparable in a head-to-head: its first steps are
        # ~sign(g)*lr regardless of |g| (and eps-damping can't fix the
        # steep-landscape chaos — the from-scratch SILog term starts at
        # ~90, so a 1e-7 cross-framework gradient difference amplifies to
        # ~1% loss divergence by step 2, measured).  SGD updates are
        # LINEAR in g, so fp reduction noise stays at noise scale and the
        # two trainers' trajectories are genuinely comparable.  Exact
        # AdamW semantics at default eps are pinned separately by
        # test_multistep_optimizer_trajectory_parity (eval-mode BN).
        "optimizer": {"type": "SGD", "lr": LR, "weight_decay": 0.0,
                      "momentum": 0.9},
        # per-EPOCH cosine (the reference steps the scheduler once per
        # epoch, :1455); with 1 epoch both sides run at base LR throughout
        "scheduler": {"type": "CosineAnnealingLR", "T_max": 1},
        "loss_weights": {"seg": 1.0, "silog": 0.1},
        # reference reads `lambda` (:1088), ours reads `lambd`
        "silog_loss": {"lambda": 0.5, "lambd": 0.5, "eps": 1e-6},
        "log_interval": 1,
        "save_interval": 1,
        "eval_interval": 1,
    }


class _ListLoader:
    def __init__(self, items):
        self._items = items

    def __iter__(self):
        return iter(self._items)

    def __len__(self):
        return len(self._items)


class _TBRecorder:
    """Stands in for the reference's SummaryWriter; records add_scalar."""

    last = None

    def __init__(self, log_dir=None):
        self.scalars = {}
        _TBRecorder.last = self

    def add_scalar(self, tag, value, step):
        self.scalars.setdefault(tag, []).append(float(value))

    def add_image(self, *a, **k):
        pass

    def flush(self):
        pass

    def close(self):
        pass


def _run_reference_trainer(ref_train_mod, sd0, batches, work_dir,
                           monkeypatch):
    """Drive the ACTUAL train_worker for one epoch on the fixed batches."""
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        CITYSCAPES_CLASSES,
    )

    cfg = {
        "model": {
            "type": "DenseCLIP",
            **_model_cfg_no_dropout(),
            "context_length": FIXED_CTX,
            "text_dim": EMBED,
            "token_embed_dim": TXT_W,
            "context_feature": "attention",
            "score_concat_index": -1,
        },
        "training": _shared_training_cfg(),
        "data": {"dataset_type": "CityscapesDepthSegDataset",
                 "crop_size": [H, W], "ignore_label": 255},
    }

    torch_batches = []
    for b in batches:
        torch_batches.append((
            torch.from_numpy(
                _normalize_host(b["image"]).transpose(0, 3, 1, 2)
            ),
            torch.from_numpy(b["seg"].astype(np.int64)),
            torch.from_numpy(b["depth"]),
            torch.from_numpy(b["depth"] > 0.0),
        ))

    monkeypatch.setattr(
        ref_train_mod, "build_dataloader",
        lambda cfg, rank=0, world_size=1: (
            _ListLoader(torch_batches), _ListLoader([]),
            list(CITYSCAPES_CLASSES), 255,
        ),
    )
    monkeypatch.setattr(ref_train_mod, "SummaryWriter", _TBRecorder)
    # dropout determinism: the reference's heads hard-code Dropout(0.1)
    monkeypatch.setattr(
        torch.nn.functional, "dropout",
        lambda x, p=0.5, training=False, inplace=False: x,
    )

    args = SimpleNamespace(
        work_dir=str(work_dir), config="head2head.yaml", resume=None,
        load=None, no_validate=True, seed=0, deterministic=False,
    )
    ref_train_mod.train_worker(0, 1, args, cfg, state_dict=sd0)

    rec = _TBRecorder.last
    assert rec is not None, "reference trainer never created its TB writer"
    losses = {
        "seg": rec.scalars.get("train_batch/loss_seg", []),
        "total": rec.scalars.get("train_batch/loss_total", []),
    }
    # Reference bug (observed while building this test): the per-batch
    # SILog scalar is NEVER written — train_denseclip.py:1374 guards on
    # `torch.is_tensor(loss_depth_silog_val)`, but that value is a float
    # (`.item()` at :1282), so the condition is always False.  Recover the
    # reference's SILog sequence from its own total/seg scalars and the
    # loss weights (total = w_seg*seg + w_silog*silog, :1313-1315).
    w = _shared_training_cfg()["loss_weights"]
    assert rec.scalars.get("train_batch/loss_depth_silog") is None
    losses["silog"] = [
        (t - w["seg"] * s) / w["silog"]
        for t, s in zip(losses["total"], losses["seg"])
    ]
    ckpt = os.path.join(str(work_dir), "checkpoints", "epoch_1.pth")
    assert os.path.exists(ckpt), (
        "reference trainer did not save its epoch checkpoint — the run "
        f"died inside train_worker; recorded losses: {losses}"
    )
    final_sd = torch.load(ckpt, map_location="cpu")["state_dict"]
    return losses, final_sd


def _run_our_trainer(sd0_np, batches, work_dir, load_dir, monkeypatch):
    """Drive our production train() on the same batches/weights."""
    from denseclip_vit_multimodal_tpu.core.config import Config
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        CITYSCAPES_CLASSES,
        build_denseclip,
    )
    from denseclip_vit_multimodal_tpu.train import checkpoint as ckpt_lib
    from denseclip_vit_multimodal_tpu.train import loop as loop_mod
    from denseclip_vit_multimodal_tpu.train.clip_import import (
        import_reference_denseclip,
    )
    from denseclip_vit_multimodal_tpu.train.state import create_train_state

    model_cfg = {
        **_model_cfg_no_dropout(),
        "context_length": FIXED_CTX,
        "text_dim": EMBED,
        "score_concat_index": -1,
    }
    cfg = Config({
        "model": model_cfg,
        "training": _shared_training_cfg(),
        "data": {
            "dataset_type": "CityscapesDepthSegDataset",
            "crop_size": [H, W],
            "scale_range": [1.0, 1.0],
            "augment": {"hflip_prob": 0.0},
            "norm_mean": list(NORM_MEAN),
            "norm_std": list(NORM_STD),
            "ignore_label": 255,
            "depth_max": 80.0,
        },
        # fp32 end to end to match CPU torch; the conftest exposes 8 CPU
        # devices, so the batch shards 1-per-device over the data axis
        "tpu": {"compute_dtype": "float32", "mesh": {"data": -1}},
    })

    # transplant the initial torch weights into a checkpoint train() loads
    model, texts = build_denseclip(model_cfg, CITYSCAPES_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32),
        jnp.asarray(texts),
    )
    variables = import_reference_denseclip(sd0_np, variables)
    variables = jax.tree.map(jnp.asarray, variables)
    state0 = create_train_state(model, variables, cfg["training"], N_STEPS)
    ckpt_lib.save_checkpoint(str(load_dir), state0, 0, 0.0)
    ckpt_lib.wait_for_pending_saves()

    class _OurLoader:
        def __init__(self, *a, **k):
            pass

        def __len__(self):
            return len(batches)

        def epoch(self, epoch):
            return iter(batches)

    monkeypatch.setattr(loop_mod, "build_dataset", lambda dc, split: object())
    monkeypatch.setattr(loop_mod, "DataLoader", _OurLoader)

    recorded = []
    real_make = loop_mod.make_train_step

    def spying_make(*a, **k):
        step = real_make(*a, **k)

        def wrapped(state, batch, rng):
            new_state, metrics = step(state, batch, rng)
            recorded.append({k: float(v) for k, v in metrics.items()})
            return new_state, metrics

        return wrapped

    monkeypatch.setattr(loop_mod, "make_train_step", spying_make)

    loop_mod.train(cfg, str(work_dir), load=str(load_dir),
                   no_validate=True)

    # read the final weights back through our own checkpoint path
    final_state, epoch, _ = ckpt_lib.restore_checkpoint(
        str(work_dir), state0
    )
    assert epoch == 0
    losses = {
        "seg": [m["loss_seg"] for m in recorded],
        "silog": [m["loss_silog"] for m in recorded],
        "total": [m["loss_total"] for m in recorded],
    }
    return losses, final_state, model, variables


def test_trainer_head_to_head(ref_pkg, ref_train_mod, tmp_path,  # noqa: F811
                              monkeypatch):
    from denseclip_vit_multimodal_tpu.models.denseclip import (
        CITYSCAPES_CLASSES,
    )
    from denseclip_vit_multimodal_tpu.train.clip_import import (
        import_reference_denseclip,
    )

    # --- shared initial weights (reference init, empty params defined) ---
    torch.manual_seed(0)
    ref0 = ref_pkg.DenseCLIP(
        class_names=list(CITYSCAPES_CLASSES),
        context_length=FIXED_CTX,
        text_dim=EMBED,
        token_embed_dim=TXT_W,
        context_feature="attention",
        score_concat_index=-1,
        **_model_cfg_no_dropout(),
    )
    with torch.no_grad():
        # never-initialized torch.empty params (models.py:811-813)
        ref0.text_encoder.positional_embedding.normal_(0, 0.01)
        ref0.text_encoder.text_projection.normal_(0, TXT_W ** -0.5)
    sd0 = {k: v.detach().clone() for k, v in ref0.state_dict().items()}
    sd0_np = {k: v.float().numpy() for k, v in sd0.items()}

    batches = _make_batches()

    ref_losses, ref_final_sd = _run_reference_trainer(
        ref_train_mod, sd0, batches, tmp_path / "ref_wd", monkeypatch
    )
    our_losses, our_final, model, variables0 = _run_our_trainer(
        sd0_np, batches, tmp_path / "our_wd", tmp_path / "load",
        monkeypatch,
    )

    # --- per-step loss sequences track (train_denseclip.py:1265-1311) ---
    assert len(ref_losses["seg"]) == N_STEPS, ref_losses
    assert len(our_losses["seg"]) == N_STEPS, our_losses
    # silog is reconstructed from the reference's total/seg scalars (see
    # _run_reference_trainer) — the 1/w_silog division amplifies their
    # recorded rounding, hence the looser tolerance.
    for key, rtol, atol in (("seg", 2e-3, 1e-4), ("total", 2e-3, 1e-4),
                            ("silog", 5e-3, 1e-2)):
        np.testing.assert_allclose(
            our_losses[key], ref_losses[key], rtol=rtol, atol=atol,
            err_msg=f"{key}: ours={our_losses[key]} ref={ref_losses[key]}",
        )
    # the trajectory is non-trivial (losses actually moved)
    assert abs(ref_losses["total"][-1] - ref_losses["total"][0]) > 1e-3

    # --- final parameters agree branch by branch ---
    zero_vars = jax.tree.map(
        lambda x: np.zeros_like(np.asarray(x)), variables0
    )
    ref_final = import_reference_denseclip(
        {k: v.detach().float().numpy() for k, v in ref_final_sd.items()},
        zero_vars,
    )["params"]
    checked = 0
    for branch in LIVE:
        ref_flat = dict(
            jax.tree_util.tree_leaves_with_path(ref_final[branch])
        )
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            our_final.params[branch]
        ):
            want = np.asarray(ref_flat[path])
            got = np.asarray(leaf)
            scale = max(float(np.abs(want).max()), 1e-8)
            # the 1e-6 floor covers leaves that START at zero (BN biases):
            # their values ARE the 5-step update (~1e-4), and per-element
            # cross-framework fp gradient noise (~1e-7/step, momentum-
            # amplified) is visible against that tiny scale.
            np.testing.assert_allclose(
                got, want, rtol=5e-3, atol=5e-3 * scale + 1e-6,
                err_msg=f"{branch}{jax.tree_util.keystr(path)}",
            )
            checked += 1
    assert checked > 30, checked

    # --- frozen towers did not move on either side (:1040-1049) ---
    init_params = jax.tree.map(np.asarray, variables0["params"])
    for frozen in ("backbone", "text_encoder"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            our_final.params[frozen], init_params[frozen],
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            ref_final[frozen], init_params[frozen],
        )
