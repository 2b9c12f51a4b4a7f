from .train import TRAINERS, Trainer, TrainerBase, TrainState, build_point_batch
from . import hooks  # noqa: F401
