"""Flax model zoo: backbones, text towers, necks, heads, composite."""

from denseclip_vit_multimodal_tpu.models.context_decoder import ContextDecoder
from denseclip_vit_multimodal_tpu.models.denseclip import (
    CITYSCAPES_CLASSES,
    DenseCLIP,
    build_denseclip,
)
from denseclip_vit_multimodal_tpu.models.heads import FCNHead, IdentityHead
from denseclip_vit_multimodal_tpu.models.necks import FPN, ViTFeatureFusionNeck
from denseclip_vit_multimodal_tpu.models.resnet import (
    CLIPResNet,
    CLIPResNetWithAttention,
)
from denseclip_vit_multimodal_tpu.models.text import (
    CLIPTextContextEncoder,
    CLIPTextEncoder,
)
from denseclip_vit_multimodal_tpu.models.vit import CLIPVisionTransformer
