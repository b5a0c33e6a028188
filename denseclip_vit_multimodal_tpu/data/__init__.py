"""Data pipeline: host decode + on-device fused augmentation."""

from denseclip_vit_multimodal_tpu.data.augment import (
    AugmentConfig,
    augment_batch,
    augment_config_from_data_cfg,
    eval_preprocess_batch,
    normalize_image,
)
from denseclip_vit_multimodal_tpu.data.loader import (
    DataLoader,
    build_dataset,
    device_prefetch,
)
from denseclip_vit_multimodal_tpu.data.synthetic import SyntheticDataset
