"""Tokenizer golden tests.

CLIP's BPE is exactly reproducible from the shipped merge table
(reference: segmentation/denseclip/utils.py:220-314).  Golden IDs below are
the publicly known CLIP token IDs ("a photo of a cat") plus the Cityscapes
class-name encodings the reference bakes into its `self.texts` buffer
(denseclip.py:373-375).
"""

import numpy as np
import pytest

from denseclip_vit_multimodal_tpu.text.tokenizer import (
    get_tokenizer,
    tokenize,
)

CITYSCAPES_CLASSES = [
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train",
    "motorcycle", "bicycle",
]

# Single BPE id per class name (between SOT=49406 and EOT=49407).
CITYSCAPES_GOLDEN = {
    "road": [1759],
    "sidewalk": [23278],
    "building": [2307],
    "wall": [2569],
    "fence": [12679],
    "pole": [8170],
    "traffic light": [3399, 1395],
    "traffic sign": [3399, 2292],
    "vegetation": [33947],
    "terrain": [20184],
    "sky": [2390],
    "person": [2533],
    "rider": [9707],
    "car": [1615],
    "truck": [4629],
    "bus": [2840],
    "train": [3231],
    "motorcycle": [10297],
    "bicycle": [11652],
}


def test_vocab_size():
    tok = get_tokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407


def test_known_clip_golden():
    # Publicly documented CLIP encoding.
    out = tokenize("a photo of a cat", context_length=8)
    assert out.tolist() == [[49406, 320, 1125, 539, 320, 2368, 49407, 0]]


def test_cityscapes_class_names():
    out = tokenize(CITYSCAPES_CLASSES, context_length=6)
    assert out.shape == (19, 6)
    assert out.dtype == np.int32
    for row, name in zip(out, CITYSCAPES_CLASSES):
        ids = CITYSCAPES_GOLDEN[name]
        expected = [49406] + ids + [49407] + [0] * (6 - 2 - len(ids))
        assert row.tolist() == expected, name


def test_roundtrip_decode():
    tok = get_tokenizer()
    for text in ["traffic light", "a photo of a cat"]:
        ids = tok.encode(text)
        assert tok.decode(ids).strip() == text
    # Punctuation decodes with word-boundary spaces (BPE </w> markers).
    ids = tok.encode("hello, world!")
    assert tok.decode(ids).split() == ["hello", ",", "world", "!"]


def test_too_long_raises():
    with pytest.raises(RuntimeError):
        tokenize("a very long sentence with many many tokens", context_length=4)


def test_truncate():
    out = tokenize(
        "a very long sentence with many many tokens",
        context_length=4,
        truncate=True,
    )
    assert out.shape == (1, 4)
    assert out[0, 0] == 49406 and out[0, -1] == 49407


def test_uppercase_and_whitespace_normalized():
    a = tokenize("Traffic   Light", 6)
    b = tokenize("traffic light", 6)
    np.testing.assert_array_equal(a, b)
