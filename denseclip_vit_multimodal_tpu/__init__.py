"""denseclip_vit_multimodal_tpu — TPU-native DenseCLIP multi-task framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Prachet-Dev-Singh/DenseCLIP_Vit_multimodal (language-guided semantic
segmentation + monocular depth on Cityscapes/ADE20K): CLIP ViT/ResNet
backbones, prompt-learning text towers, context decoder, pixel-text score
maps, FCN heads, fused data pipeline, pjit data/tensor-parallel training,
and batched sliding-window inference.

Top-level API (lazily imported to keep `import denseclip_vit_multimodal_tpu`
cheap):

    load_config / resolve_config_path  — YAML config system
    build_denseclip                    — config dict -> (model, texts)
    Inferencer                         — whole / slide / aug_test engines
    train                              — full training entry
"""

__version__ = "0.1.0"

_LAZY = {
    "load_config": "denseclip_vit_multimodal_tpu.core.config",
    "resolve_config_path": "denseclip_vit_multimodal_tpu.core.config",
    "build_denseclip": "denseclip_vit_multimodal_tpu.models.denseclip",
    "CITYSCAPES_CLASSES": "denseclip_vit_multimodal_tpu.models.denseclip",
    "Inferencer": "denseclip_vit_multimodal_tpu.infer.engine",
    "train": "denseclip_vit_multimodal_tpu.train.loop",
    "tokenize": "denseclip_vit_multimodal_tpu.text.tokenizer",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(name)


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
