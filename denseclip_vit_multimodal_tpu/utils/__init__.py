"""Utilities: visualization, environment/determinism, profiling hooks."""

from denseclip_vit_multimodal_tpu.utils.env import (
    seed_everything,
    StepTimer,
    collect_env_info,
    profiler_trace,
    set_determinism,
)
from denseclip_vit_multimodal_tpu.utils.visualize import (
    CITYSCAPES_PALETTE,
    colorize_depth,
    colorize_seg,
    denormalize_image,
    save_multi_task_panel,
)
