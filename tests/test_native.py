"""Native host-ops: C++ kernels vs numpy reference implementations."""

import numpy as np
import pytest

from denseclip_vit_multimodal_tpu.data import _native
from denseclip_vit_multimodal_tpu.data.cityscapes import (
    BASELINE_FOCAL_LENGTH,
    ID_TO_TRAIN_ID,
    IGNORE_INDEX,
)

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native hostops library not built"
)


def _numpy_remap(labels):
    out = np.full(labels.shape, IGNORE_INDEX, dtype=np.uint8)
    in_range = labels < len(ID_TO_TRAIN_ID)
    out[in_range] = ID_TO_TRAIN_ID[labels[in_range]]
    return out


def _numpy_disp_to_depth(disp, depth_max=80.0, bf=BASELINE_FOCAL_LENGTH):
    d = disp.astype(np.float32)
    raw_valid = d > 0
    scaled = np.where(raw_valid, (d - 1.0) / 256.0, 0.0)
    usable = scaled > 1e-3
    depth = np.where(usable, bf / (scaled + 1e-6), 0.0).astype(np.float32)
    depth = np.where(raw_valid & usable & (depth <= depth_max), depth, 0.0)
    return depth.astype(np.float32), depth > 0.0


def test_native_remap_matches_numpy():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 256, (257, 511), dtype=np.uint8)
    np.testing.assert_array_equal(
        _native.remap_labels(labels, ID_TO_TRAIN_ID, IGNORE_INDEX),
        _numpy_remap(labels),
    )


def test_native_disparity_matches_numpy():
    rng = np.random.RandomState(1)
    disp = rng.randint(0, 65536, (300, 400), dtype=np.uint16)
    disp[::7] = 0  # invalid stripes
    native_depth, n_valid = _native.disparity_to_depth(
        disp, 80.0, BASELINE_FOCAL_LENGTH
    )
    ref_depth, ref_valid = _numpy_disp_to_depth(disp)
    np.testing.assert_allclose(native_depth, ref_depth, rtol=1e-6)
    assert n_valid == int(ref_valid.sum())


def test_native_normalize_matches_numpy():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (64, 32, 3), dtype=np.uint8)
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    native = _native.normalize_image(img, mean, std)
    ref = (img.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(
        std, np.float32
    )
    np.testing.assert_allclose(native, ref, rtol=1e-5, atol=1e-6)


def test_dataset_path_uses_native_consistently():
    """remap_labels / disparity_to_depth public APIs agree with numpy path."""
    from denseclip_vit_multimodal_tpu.data.cityscapes import (
        disparity_to_depth,
        remap_labels,
    )

    rng = np.random.RandomState(3)
    labels = rng.randint(0, 60, (100, 100), dtype=np.uint8)
    np.testing.assert_array_equal(remap_labels(labels), _numpy_remap(labels))
    disp = rng.randint(0, 40000, (100, 100), dtype=np.uint16)
    depth, valid = disparity_to_depth(disp, 80.0)
    ref_depth, ref_valid = _numpy_disp_to_depth(disp)
    np.testing.assert_allclose(depth, ref_depth, rtol=1e-6)
    np.testing.assert_array_equal(valid.astype(bool), ref_valid)
