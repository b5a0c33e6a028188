"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

The reference has no test suite (SURVEY.md §4); ours tests the observable
contracts (tokenizer goldens, loss math vs torch, label remaps, shape
contracts, metric math) and the multi-chip sharding logic on a virtual CPU
mesh — the TPU-native analog of "test multi-node without a cluster".
"""

import os

# Must run before the CPU backend initializes.  NOTE: in some environments a
# sitecustomize hook imports jax at interpreter startup and pins a TPU
# platform via JAX_PLATFORMS; plain env vars set here are then too late, so
# we also force the platform through jax.config below (safe as long as no
# computation has run yet).
os.environ["JAX_PLATFORMS"] = "cpu"
# REPLACE any inherited device-count flag (a leftover =4 from a debugging
# shell would otherwise survive the 'not in' guard and abort the suite's
# 8-device assert at collection).
flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if not f.startswith("--xla_force_host_platform_device_count")
]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compile cache makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.devices()[0].platform
)
assert jax.device_count() == 8, jax.device_count()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def tiny_model_cfg():
    """A small ViT DenseCLIP config mirroring the Cityscapes YAML schema."""
    return {
        "type": "DenseCLIP",
        "text_dim": 512,
        "context_length": 6,
        "token_embed_dim": 512,
        "context_feature": "attention",
        "score_concat_index": -1,
        "tau": 0.05,
        "backbone": {
            "type": "CLIPVisionTransformer",
            "patch_size": 16,
            "width": 96,
            "layers": 4,
            "heads": 3,
            "input_resolution": 224,
            "output_dim": 96,
            "out_indices": [0, 1, 2, 3],
        },
        "text_encoder": {
            "type": "CLIPTextContextEncoder",
            "context_length": 22,
            "vocab_size": 49408,
            "transformer_width": 512,
            "transformer_heads": 8,
            "transformer_layers": 2,
            "embed_dim": 512,
        },
        "neck": {
            "type": "ViTFeatureFusionNeck",
            "inter_channels": 32,
            "out_channels": 64,
        },
        "decode_head": {
            "type": "FPNHead",
            "in_channels": 64,
            "channels": 64,
            "num_classes": 19,
            "align_corners": False,
        },
        "depth_head": {
            "type": "FCNHeadDepth",
            "in_channels": 64,
            "channels": 32,
        },
    }
