"""On-disk dataset integration: real PNG/JPG trees -> scan -> decode -> loader
-> train step.

Every other subsystem in this repo carries executed proof; these tests close
the last gap by exercising the actual filesystem entry points a user hits
first — directory scanning with triplet matching, PIL decode of real PNG
bytes (8-bit RGB, 8-bit palette-free labels, 16-bit disparity), per-sample
error fallback, and the loader's resample-on-failure — against miniature
dataset trees written to tmp.

Reference contracts covered:
  * Cityscapes triplet scan + alignment
    (reference segmentation/datasets/cityscapes_depth_seg.py:72-110)
  * PNG decode incl. uint16 disparity (cityscapes_depth_seg.py:117-135)
  * per-sample error fallback -> None (cityscapes.py:106-123)
  * None-collate / resample semantics (train_denseclip.py:246-262)
  * ADE20K layout + 0->ignore remap (ade20k.py:44-48, 155-167)
"""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from denseclip_vit_multimodal_tpu.data.cityscapes import (
    CityscapesDataset,
    CityscapesDepthSegDataset,
    ID_TO_TRAIN_ID,
    IGNORE_INDEX,
    disparity_to_depth,
    remap_labels,
)
from denseclip_vit_multimodal_tpu.data.ade20k import ADE20KSegmentation
from denseclip_vit_multimodal_tpu.data.loader import DataLoader, build_dataset
from denseclip_vit_multimodal_tpu.data import _native


H, W = 64, 128


def _write_city_sample(root, split, city, base, rng, *, disparity=True,
                       corrupt_image=False):
    """Write one (image, labelIds, disparity) triplet of real PNG bytes."""
    img_dir = osp.join(root, "leftImg8bit", split, city)
    lbl_dir = osp.join(root, "gtFine", split, city)
    dsp_dir = osp.join(root, "disparity", split, city)
    for d in (img_dir, lbl_dir, dsp_dir):
        os.makedirs(d, exist_ok=True)

    img_path = osp.join(img_dir, f"{base}_leftImg8bit.png")
    if corrupt_image:
        # Real path, invalid PNG bytes -> PIL raises inside __getitem__.
        with open(img_path, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\nnot actually a png")
    else:
        img = rng.randint(0, 256, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(img_path)

    # labelIds span the full 0..33 raw space (incl. ids that remap to ignore).
    label = rng.randint(0, 34, (H, W)).astype(np.uint8)
    Image.fromarray(label, mode="L").save(
        osp.join(lbl_dir, f"{base}_gtFine_labelIds.png")
    )

    if disparity:
        # uint16 disparity incl. zeros (invalid) and tiny scaled values.
        disp = rng.randint(0, 30000, (H, W)).astype(np.uint16)
        disp[::7] = 0
        Image.fromarray(disp).save(  # uint16 -> PIL I;16, like the real data
            osp.join(dsp_dir, f"{base}_disparity.png")
        )
    return img_path


@pytest.fixture()
def cityscapes_tree(tmp_path):
    """Miniature Cityscapes: 2 cities x 4 train samples + 2 val samples,
    one train sample missing its disparity, one with a corrupt image."""
    root = str(tmp_path / "cityscapes")
    rng = np.random.RandomState(0)
    paths = {}
    for city in ("aachen", "bochum"):
        for i in range(4):
            base = f"{city}_00000{i}_000019"
            paths[base] = _write_city_sample(root, "train", city, base, rng)
    # misaligned triplet: image+label but NO disparity
    _write_city_sample(root, "train", "aachen", "aachen_000009_000019", rng,
                       disparity=False)
    # corrupt image bytes (full triplet present, decode fails)
    paths["corrupt"] = _write_city_sample(
        root, "train", "bochum", "bochum_000009_000019", rng,
        corrupt_image=True)
    for base in ["frankfurt_000000_000294", "frankfurt_000001_000294"]:
        _write_city_sample(root, "val", "frankfurt", base, rng)
    return root


def test_scan_skips_misaligned_triplets(cityscapes_tree):
    ds = CityscapesDepthSegDataset(cityscapes_tree, split="train")
    bases = [osp.basename(s[0]) for s in ds.samples]
    # 4 complete + 1 corrupt-but-complete triplet; the disparity-less sample
    # is excluded at scan time (reference cityscapes_depth_seg.py:99-105).
    assert len(ds) == 9
    assert not any("aachen_000009" in b for b in bases)
    assert any("bochum_000009" in b for b in bases)  # corrupt scans fine
    # seg-only dataset needs no disparity: the misaligned sample is included.
    seg_ds = CityscapesDataset(cityscapes_tree, split="train")
    assert len(seg_ds) == 10


def test_getitem_decodes_real_pngs(cityscapes_tree):
    ds = CityscapesDepthSegDataset(cityscapes_tree, split="train")
    good = [i for i, s in enumerate(ds.samples)
            if "bochum_000009" not in s[0]]
    sample = ds[good[0]]
    assert sample is not None
    img, seg, depth = sample["image"], sample["seg"], sample["depth"]
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    assert seg.shape == (H, W) and seg.dtype == np.uint8
    assert depth.shape == (H, W) and depth.dtype == np.float32
    # remap happened: every value is a trainId or ignore
    assert set(np.unique(seg)) <= set(range(19)) | {IGNORE_INDEX}
    # depth semantics: zero-disparity rows carry ignore depth 0
    assert np.all(depth >= 0) and np.any(depth == 0) and np.any(depth > 0)
    assert np.all(depth[depth > 0] <= 80.0)


def test_getitem_roundtrips_label_bytes(cityscapes_tree):
    """Decoded labels match the remap table applied to the raw bytes."""
    ds = CityscapesDepthSegDataset(cityscapes_tree, split="train",
                                   remap=False)
    good = next(i for i, s in enumerate(ds.samples)
                if "bochum_000009" not in s[0])
    raw = ds[good]["seg"]
    ds_remap = CityscapesDepthSegDataset(cityscapes_tree, split="train")
    remapped = ds_remap[good]["seg"]
    expect = np.full(raw.shape, IGNORE_INDEX, np.uint8)
    lo = raw < 34
    expect[lo] = ID_TO_TRAIN_ID[raw[lo]]
    np.testing.assert_array_equal(remapped, expect)


def test_corrupt_png_returns_none_and_loader_resamples(cityscapes_tree):
    ds = CityscapesDepthSegDataset(cityscapes_tree, split="train")
    bad = next(i for i, s in enumerate(ds.samples)
               if "bochum_000009" in s[0])
    assert ds[bad] is None  # error fallback (reference cityscapes.py:106-123)
    # The loader must still deliver full static-shape batches.
    loader = DataLoader(ds, batch_size=9, shuffle=False, num_threads=2,
                        process_index=0, process_count=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 1
    batch = batches[0]
    assert batch["image"].shape == (9, H, W, 3)
    assert batch["seg"].shape == (9, H, W)
    assert batch["depth"].shape == (9, H, W)
    assert batch["image"].dtype == np.uint8


def test_native_vs_numpy_agree_on_decoded_arrays(cityscapes_tree):
    """The C++ remap/disparity kernels agree with numpy on REAL decoded
    bytes, not just synthetic arrays (tests/test_native.py covers those)."""
    if not _native.available():
        pytest.skip("native hostops library not built")
    ds = CityscapesDepthSegDataset(cityscapes_tree, split="train")
    img_path, label_path, disp_path = next(
        s for s in ds.samples if "bochum_000009" not in s[0])
    raw_label = np.asarray(Image.open(label_path), dtype=np.uint8)
    raw_disp = np.asarray(Image.open(disp_path))
    assert raw_disp.dtype in (np.uint16, np.int32)  # PIL I;16 readback
    raw_disp = raw_disp.astype(np.uint16)

    native_remap = _native.remap_labels(raw_label, ID_TO_TRAIN_ID,
                                        IGNORE_INDEX)
    assert native_remap is not None
    np_remap = np.full(raw_label.shape, IGNORE_INDEX, np.uint8)
    lo = raw_label < 34
    np_remap[lo] = ID_TO_TRAIN_ID[raw_label[lo]]
    np.testing.assert_array_equal(native_remap, np_remap)

    depth_n, _ = disparity_to_depth(raw_disp)  # dispatches native
    nat = _native.disparity_to_depth(
        raw_disp, 80.0, 500.0, scale=256.0, offset=1.0,
        min_scaled=1e-3, ignore_value=0.0)
    assert nat is not None
    # force the numpy path via a float64 view of the same values
    depth_np, _ = disparity_to_depth(raw_disp.astype(np.float64))
    np.testing.assert_allclose(depth_n, depth_np, rtol=2e-5, atol=1e-3)


def test_train_step_runs_from_disk(cityscapes_tree, tmp_path):
    """Full path: scan -> PIL decode -> loader -> device aug -> train step."""
    from denseclip_vit_multimodal_tpu.core.config import Config
    from denseclip_vit_multimodal_tpu.train.loop import train

    cfg = Config({
        "data": {
            "dataset_type": "CityscapesDepthSegDataset",
            "path": cityscapes_tree,
            "classes": 19,
            "ignore_label": 255,
            "depth_max": 80.0,
            "crop_size": [32, 64],
            "scale_range": [0.75, 1.25],
        },
        "model": {
            "type": "DenseCLIP",
            "text_dim": 64, "context_length": 6, "token_embed_dim": 64,
            "score_concat_index": -1,
            "backbone": {"type": "CLIPVisionTransformer", "patch_size": 16,
                         "width": 64, "layers": 2, "heads": 2,
                         "input_resolution": 64, "output_dim": 64,
                         "out_indices": [0, 1]},
            "text_encoder": {"type": "CLIPTextContextEncoder",
                             "context_length": 10, "vocab_size": 49408,
                             "transformer_width": 64, "transformer_heads": 2,
                             "transformer_layers": 2, "embed_dim": 64},
            "neck": {"type": "ViTFeatureFusionNeck", "inter_channels": 16,
                     "out_channels": 32},
            "decode_head": {"type": "FPNHead", "in_channels": 32,
                            "channels": 32, "num_classes": 19},
            "depth_head": {"type": "FCNHeadDepth", "in_channels": 32,
                           "channels": 16},
        },
        "training": {
            "epochs": 1, "batch_size": 8, "workers": 2,
            "optimizer": {"lr": 1e-3, "weight_decay": 0.01},
            "scheduler": {"type": "CosineAnnealingLR", "T_max": 1},
            "seed": 0, "eval_interval": 1, "save_interval": 1,
            "log_interval": 1,
        },
        "tpu": {"compute_dtype": "float32", "mesh": {"data": -1}},
    })
    metrics = train(cfg, str(tmp_path / "work"))
    # validation ran on the on-disk val split (2 frankfurt samples)
    assert "miou" in metrics and np.isfinite(metrics["miou"])
    assert "depth_rmse" in metrics and np.isfinite(metrics["depth_rmse"])


@pytest.fixture()
def ade20k_tree(tmp_path):
    root = str(tmp_path / "ade20k")
    rng = np.random.RandomState(1)
    for split, names in [("training", ["ADE_train_00000001",
                                       "ADE_train_00000002"]),
                         ("validation", ["ADE_val_00000001"])]:
        img_dir = osp.join(root, "ADEChallengeData2016", "images", split)
        ann_dir = osp.join(root, "ADEChallengeData2016", "annotations", split)
        os.makedirs(img_dir)
        os.makedirs(ann_dir)
        for i, name in enumerate(names):
            # varying sizes: the dataset must resize to its fixed canvas
            h, w = 48 + 16 * i, 96 + 32 * i
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(osp.join(img_dir, f"{name}.jpg"),
                                      quality=90)
            label = rng.randint(0, 151, (h, w)).astype(np.uint8)
            label[0, 0] = 0  # background pixel -> must remap to ignore
            Image.fromarray(label, mode="L").save(
                osp.join(ann_dir, f"{name}.png"))
        # an image with no annotation must be skipped at scan time
        Image.fromarray(rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)).save(
            osp.join(img_dir, "ADE_orphan.jpg"))
    return root


def test_ade20k_scan_decode_remap(ade20k_tree):
    ds = ADE20KSegmentation(ade20k_tree, split="train",
                            canvas_size=(64, 128))
    assert len(ds) == 2  # orphan jpg skipped
    sample = ds[0]
    assert sample is not None
    assert sample["image"].shape == (64, 128, 3)
    assert sample["seg"].shape == (64, 128)
    seg = sample["seg"]
    # 0 -> ignore, 1..150 -> 0..149: nothing may remain at raw value 150+
    assert set(np.unique(seg)) <= set(range(150)) | {IGNORE_INDEX}
    assert IGNORE_INDEX in np.unique(seg)  # the planted background pixel
    val = ADE20KSegmentation(ade20k_tree, split="val", canvas_size=(64, 128))
    assert len(val) == 1


def test_ade20k_through_loader(ade20k_tree):
    cfg = {"dataset_type": "ADE20KSegmentation", "path": ade20k_tree}
    ds = build_dataset(cfg, "training")
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_threads=2,
                        process_index=0, process_count=1)
    (batch,) = list(loader.epoch(0))
    assert batch["image"].shape == (2, 512, 683, 3)
    assert batch["seg"].shape == (2, 512, 683)
    assert "depth" not in batch
