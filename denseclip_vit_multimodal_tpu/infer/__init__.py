"""Inference engines: whole-image, batched slide-window, aug_test."""

from denseclip_vit_multimodal_tpu.infer.engine import Inferencer, package_outputs
from denseclip_vit_multimodal_tpu.infer.exported import ExportedInferencer
from denseclip_vit_multimodal_tpu.infer.slide import (
    count_map,
    slide_grid,
    slide_inference,
    window_origins,
)
