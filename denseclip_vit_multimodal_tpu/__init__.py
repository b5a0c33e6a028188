"""denseclip_vit_multimodal_tpu — TPU-native DenseCLIP multi-task framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Prachet-Dev-Singh/DenseCLIP_Vit_multimodal (language-guided semantic
segmentation + monocular depth on Cityscapes/ADE20K): CLIP ViT/ResNet
backbones, prompt-learning text towers, context decoder, pixel-text score
maps, FCN heads, fused data pipeline, pjit data-parallel training, and
batched sliding-window inference.
"""

__version__ = "0.1.0"
