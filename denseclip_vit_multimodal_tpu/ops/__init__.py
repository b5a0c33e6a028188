"""TPU ops: Pallas attention kernels + fused score map."""

from denseclip_vit_multimodal_tpu.ops.attention import (
    flash_attention,
    flash_supported,
)
from denseclip_vit_multimodal_tpu.ops.mha_kernel import (
    mha_attention,
    mha_qkv_attention,
)
from denseclip_vit_multimodal_tpu.ops.score_map import l2_normalize, score_map
