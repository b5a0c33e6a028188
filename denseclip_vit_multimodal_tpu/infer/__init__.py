"""Inference engines: whole-image, batched slide-window, aug_test."""

from denseclip_vit_multimodal_tpu.infer.engine import Inferencer
from denseclip_vit_multimodal_tpu.infer.slide import (
    count_map,
    slide_grid,
    slide_inference,
    window_origins,
)
