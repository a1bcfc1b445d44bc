from pero_pretraining_tpu.training.schedules import warmup_polynomial_schedule
from pero_pretraining_tpu.training.state import TrainState
from pero_pretraining_tpu.training.trainer import Trainer, scale_by_adam_8bit, scale_by_adam_lowmem
from pero_pretraining_tpu.training.checkpoint import (
    get_checkpoint_path,
    get_visualization_path,
    load_checkpoint,
    save_checkpoint,
)

__all__ = [
    "warmup_polynomial_schedule",
    "TrainState",
    "Trainer",
    "scale_by_adam_8bit",
    "scale_by_adam_lowmem",
    "get_checkpoint_path",
    "get_visualization_path",
    "save_checkpoint",
    "load_checkpoint",
]
