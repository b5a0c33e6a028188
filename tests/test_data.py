"""Data pipeline tests: remaps, disparity->depth, fused augmentation, loader.

Contract sources: reference cityscapes.py:19-21 (remap table),
cityscapes_depth_seg.py:137-170 (disparity math), train_denseclip.py:104-172
(augmentation chain semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denseclip_vit_multimodal_tpu.data.augment import (
    AugmentConfig,
    augment_batch,
    eval_preprocess_batch,
    normalize_image,
)
from denseclip_vit_multimodal_tpu.data.cityscapes import (
    ID_TO_TRAIN_ID,
    disparity_to_depth,
    remap_labels,
)
from denseclip_vit_multimodal_tpu.data import ade20k
from denseclip_vit_multimodal_tpu.data.loader import DataLoader, build_dataset
from denseclip_vit_multimodal_tpu.data.synthetic import SyntheticDataset


def test_remap_table_contents():
    # Reference cityscapes.py:19-21.
    assert ID_TO_TRAIN_ID[7] == 0 and ID_TO_TRAIN_ID[33] == 18
    assert ID_TO_TRAIN_ID[0] == 255 and ID_TO_TRAIN_ID[29] == 255
    labels = np.array([[7, 8, 250], [26, 0, 33]], dtype=np.int32)
    out = remap_labels(labels)
    np.testing.assert_array_equal(out, [[0, 1, 255], [13, 255, 18]])


def test_trainid_to_labelid_roundtrip():
    """The submission-format inverse map: every trainId round-trips through
    its labelId; ignore maps to labelId 0 ('unlabeled')."""
    from denseclip_vit_multimodal_tpu.data.cityscapes import (
        labelids_from_trainids,
    )

    train_ids = np.arange(19, dtype=np.uint8).reshape(1, 19)
    label_ids = labelids_from_trainids(train_ids)
    np.testing.assert_array_equal(ID_TO_TRAIN_ID[label_ids], train_ids)
    assert labelids_from_trainids(np.array([255], np.uint8))[0] == 0


def test_disparity_to_depth_math():
    # depth = 500 / ((d - 1) / 256); reference cityscapes_depth_seg.py:137-170.
    disp = np.array([[0, 257], [25601, 65535]], dtype=np.uint16)
    depth, valid = disparity_to_depth(disp, depth_max=80.0)
    assert depth[0, 0] == 0.0 and valid[0, 0] == 0
    # disparity 257 -> scaled 1.0 -> depth 500m > depth_max -> invalid, zeroed
    assert valid[0, 1] == 0 and depth[0, 1] == 0.0
    np.testing.assert_allclose(depth[1, 0], 500.0 / 100.0, rtol=1e-4)
    assert valid[1, 0] == 1


def test_ade20k_remap():
    labels = np.array([[0, 1], [150, 75]], dtype=np.uint8)
    out = ade20k.remap_labels(labels)
    np.testing.assert_array_equal(out, [[255, 0], [149, 74]])


def test_augment_shapes_and_ranges():
    cfg = AugmentConfig(crop_size=(64, 128), scale_range=(0.5, 2.0))
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (2, 100, 200, 3), dtype=np.uint8),
        "seg": rng.randint(0, 19, (2, 100, 200)).astype(np.uint8),
        "depth": rng.uniform(0, 80, (2, 100, 200)).astype(np.float32),
    }
    out = jax.jit(lambda k, b: augment_batch(k, b, cfg))(
        jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, batch)
    )
    assert out["image"].shape == (2, 64, 128, 3)
    assert out["seg"].shape == (2, 64, 128)
    assert out["depth"].shape == (2, 64, 128)
    assert out["depth_mask"].dtype == jnp.bool_
    seg = np.asarray(out["seg"])
    assert set(np.unique(seg)).issubset(set(range(19)) | {255})
    assert np.isfinite(np.asarray(out["image"])).all()
    # Depth mask matches positivity (reference cityscapes_depth_seg.py:218).
    np.testing.assert_array_equal(
        np.asarray(out["depth_mask"]), np.asarray(out["depth"]) > 0
    )


def test_augment_identity_when_scale_one():
    """scale=1, no flip, no jitter -> crop is a verbatim window."""
    cfg = AugmentConfig(
        crop_size=(32, 32), scale_range=(1.0, 1.0), hflip_prob=0.0,
        norm_mean=(0.0, 0.0, 0.0), norm_std=(1.0, 1.0, 1.0),
    )
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.float32)
    seg = rng.randint(0, 19, (64, 64)).astype(np.int32)
    out = augment_batch(
        jax.random.PRNGKey(3),
        {"image": jnp.asarray(img[None]), "seg": jnp.asarray(seg[None])},
        cfg,
    )
    out_img = np.asarray(out["image"][0]) * 255.0
    out_seg = np.asarray(out["seg"][0])
    # The sampled window must exist verbatim somewhere in the source
    # (integer crop offsets at scale 1.0 -> exact pixel copy).
    found = False
    for y0 in range(33):
        for x0 in range(33):
            if np.allclose(out_img, img[y0 : y0 + 32, x0 : x0 + 32], atol=1e-3):
                np.testing.assert_array_equal(
                    out_seg, seg[y0 : y0 + 32, x0 : x0 + 32]
                )
                found = True
                break
        if found:
            break
    assert found, "augmented crop is not a clean window of the source"


def test_augment_pad_fill_on_downscale():
    """scale < crop/size -> out-of-canvas pixels get fill values."""
    cfg = AugmentConfig(
        crop_size=(64, 64), scale_range=(0.25, 0.25), hflip_prob=0.0,
        norm_mean=(0.0, 0.0, 0.0), norm_std=(1.0, 1.0, 1.0),
    )
    batch = {
        "image": jnp.full((1, 64, 64, 3), 200, jnp.uint8),
        "seg": jnp.zeros((1, 64, 64), jnp.int32),
        "depth": jnp.full((1, 64, 64), 10.0, jnp.float32),
    }
    out = augment_batch(jax.random.PRNGKey(0), batch, cfg)
    seg = np.asarray(out["seg"][0])
    # Scaled image is 16x16 centered in a 64x64 crop: borders are padding.
    assert (seg[0] == 255).all() and (seg[-1] == 255).all()
    assert (np.asarray(out["depth"][0])[0] == 0.0).all()
    assert (np.asarray(out["image"][0])[0] == 0.0).all()
    # Center retains data.
    assert seg[32, 32] == 0
    assert np.asarray(out["depth"][0])[32, 32] == 10.0


def test_matmul_resample_matches_gather():
    """The MXU matmul resampler must equal the gather resampler exactly."""
    cfg = AugmentConfig(crop_size=(48, 96), scale_range=(0.4, 2.0),
                        norm_mean=(0, 0, 0), norm_std=(1, 1, 1))
    rng = np.random.RandomState(5)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (3, 80, 120, 3), dtype=np.uint8)),
        "seg": jnp.asarray(rng.randint(0, 19, (3, 80, 120)).astype(np.uint8)),
        "depth": jnp.asarray(rng.uniform(0, 80, (3, 80, 120)).astype(np.float32)),
    }
    key = jax.random.PRNGKey(11)
    mm = augment_batch(key, batch, cfg, use_matmul_resample=True)
    ga = augment_batch(key, batch, cfg, use_matmul_resample=False)
    np.testing.assert_allclose(
        np.asarray(mm["image"]), np.asarray(ga["image"]), atol=2e-3
    )
    np.testing.assert_array_equal(np.asarray(mm["seg"]), np.asarray(ga["seg"]))
    np.testing.assert_allclose(
        np.asarray(mm["depth"]), np.asarray(ga["depth"]), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(mm["depth_mask"]), np.asarray(ga["depth_mask"])
    )


def test_eval_preprocess_resizes_image_only():
    cfg = AugmentConfig(crop_size=(32, 64))
    batch = {
        "image": jnp.zeros((2, 100, 200, 3), jnp.uint8),
        "seg": jnp.zeros((2, 100, 200), jnp.int32),
        "depth": jnp.ones((2, 100, 200), jnp.float32),
    }
    out = eval_preprocess_batch(batch, cfg)
    assert out["image"].shape == (2, 32, 64, 3)
    assert out["seg"].shape == (2, 100, 200)  # GT stays native
    assert out["depth_mask"].shape == (2, 100, 200)


def test_synthetic_deterministic():
    ds = SyntheticDataset(length=4, image_size=(64, 128), seed=1)
    a, b = ds[2], ds[2]
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["image"].shape == (64, 128, 3)
    assert a["depth"].shape == (64, 128)


def test_loader_batching_and_sharding():
    ds = SyntheticDataset(length=10, image_size=(32, 64))
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0,
                        num_threads=2, process_index=0, process_count=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 2  # drop_last
    assert batches[0]["image"].shape == (4, 32, 64, 3)
    # Epoch permutation changes with epoch (sampler.set_epoch semantics).
    b0 = list(loader.epoch(0))[0]["image"]
    b1 = list(loader.epoch(1))[0]["image"]
    assert not np.array_equal(b0, b1)
    # Rank-strided split covers disjoint indices.
    l0 = DataLoader(ds, batch_size=2, shuffle=False, process_index=0,
                    process_count=2)
    l1 = DataLoader(ds, batch_size=2, shuffle=False, process_index=1,
                    process_count=2)
    i0 = l0._epoch_indices(0)
    i1 = l1._epoch_indices(0)
    assert set(i0).isdisjoint(set(i1))
    assert len(set(i0) | set(i1)) == 10


def test_loader_resamples_failures():
    class Flaky(SyntheticDataset):
        def __getitem__(self, idx):
            if idx % 3 == 0:
                return None
            return super().__getitem__(idx)

    ds = Flaky(length=9, image_size=(16, 32))
    loader = DataLoader(ds, batch_size=3, shuffle=False, num_threads=1)
    batches = list(loader.epoch(0))
    assert all(b["image"].shape == (3, 16, 32, 3) for b in batches)


def test_build_dataset_synthetic_dispatch():
    ds = build_dataset(
        {"dataset_type": "CityscapesDepthSegDataset", "synthetic": True,
         "synthetic_options": {"length": 3, "image_size": [32, 64]}},
        "train",
    )
    assert len(ds) == 3 and "depth" in ds[0]
    with pytest.raises(ValueError):
        build_dataset({"dataset_type": "Nope"}, "train")


def test_augment_upscale_border_not_darkened():
    """Upscaled border rows sample the edge pixel at FULL weight (cv2 clamp).

    Without the clamp the tent kernel loses the mass falling outside the
    source and every border row/col of an upscaled crop is darkened.
    """
    cfg = AugmentConfig(
        crop_size=(32, 32), scale_range=(2.0, 2.0), hflip_prob=0.0,
        norm_mean=(0.0, 0.0, 0.0), norm_std=(1.0, 1.0, 1.0),
    )
    batch = {"image": jnp.full((1, 16, 16, 3), 200, jnp.uint8)}
    for mm in (True, False):
        out = augment_batch(
            jax.random.PRNGKey(0), batch, cfg, use_matmul_resample=mm
        )
        img = np.asarray(out["image"][0]) * 255.0
        np.testing.assert_allclose(img, 200.0, atol=1e-3,
                                   err_msg=f"matmul={mm}")


def test_augment_pad_region_pure_fill_next_to_upscaled_image():
    """Pad rows adjacent to an upscaled image are EXACT fill (no edge bleed).

    An 8x8 source at scale 2 centered in a 32x32 crop occupies output
    rows/cols 8..23; rows 7 and 24 are padding whose half-pixel source
    coordinate lies within the tent support of the edge pixel — they must
    still be pure fill, like Albumentations' PadIfNeeded.
    """
    cfg = AugmentConfig(
        crop_size=(32, 32), scale_range=(2.0, 2.0), hflip_prob=0.0,
        norm_mean=(0.0, 0.0, 0.0), norm_std=(1.0, 1.0, 1.0),
    )
    batch = {
        "image": jnp.full((1, 8, 8, 3), 255, jnp.uint8),
        "seg": jnp.full((1, 8, 8), 3, jnp.int32),
    }
    for mm in (True, False):
        out = augment_batch(
            jax.random.PRNGKey(0), batch, cfg, use_matmul_resample=mm
        )
        img = np.asarray(out["image"][0]) * 255.0
        seg = np.asarray(out["seg"][0])
        # image region: exact constant, full brightness
        np.testing.assert_allclose(img[8:24, 8:24], 255.0, atol=1e-3)
        # pad ring: exact fill, including the rows touching the image
        assert (img[:8] == 0.0).all() and (img[24:] == 0.0).all()
        assert (img[:, :8] == 0.0).all() and (img[:, 24:] == 0.0).all()
        assert (seg[:8] == 255).all() and (seg[24:] == 255).all()
        assert (seg[8:24, 8:24] == 3).all()


def test_loader_equal_batches_across_processes_with_remainder():
    """ceil-padded per-process counts: every rank emits the SAME number of
    batches (DistributedSampler semantics) so no process is left alone
    inside a collective train step."""
    ds = SyntheticDataset(length=9, image_size=(16, 32))
    loaders = [
        DataLoader(ds, batch_size=5, shuffle=False, num_threads=1,
                   process_index=i, process_count=2)
        for i in range(2)
    ]
    counts = [len(list(ld.epoch(0))) for ld in loaders]
    assert counts[0] == counts[1] == 1
    assert [len(ld) for ld in loaders] == counts
    # All real samples are still covered across ranks (wrap-padding only).
    i0, i1 = (set(ld._epoch_indices(0)) for ld in loaders)
    assert i0 | i1 == set(range(9))

    # pathological: world >> dataset (pod smoke runs) — the permutation is
    # TILED so every rank still gets the same nonzero count
    tiny = SyntheticDataset(length=3, image_size=(16, 32))
    many = [
        DataLoader(tiny, batch_size=1, shuffle=False, num_threads=1,
                   process_index=i, process_count=8)
        for i in range(8)
    ]
    per_rank = [len(ld._epoch_indices(0)) for ld in many]
    assert per_rank == [1] * 8, per_rank
