"""Training: losses, metrics, schedules, state, steps, loop, checkpointing."""

from denseclip_vit_multimodal_tpu.train.losses import cross_entropy_loss, silog_loss
from denseclip_vit_multimodal_tpu.train.metrics import (
    accuracy_from_confusion,
    confusion_matrix,
    depth_errors,
    finalize_depth_errors,
    miou_from_confusion,
)
from denseclip_vit_multimodal_tpu.train.schedules import build_schedule
from denseclip_vit_multimodal_tpu.train.state import TrainState, create_train_state
from denseclip_vit_multimodal_tpu.train.step import make_eval_step, make_train_step
