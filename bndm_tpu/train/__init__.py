from bndm_tpu.train.losses import (
    antithetic_timesteps,
    bndm_loss,
    iadb_loss,
    ddim_loss,
    remap_batch,
)
from bndm_tpu.train.ema import EmaState, ema_init, ema_update
from bndm_tpu.train.pixel import PixelTrainer, TrainConfig, TrainState

__all__ = [
    "antithetic_timesteps",
    "bndm_loss",
    "iadb_loss",
    "ddim_loss",
    "remap_batch",
    "EmaState",
    "ema_init",
    "ema_update",
    "PixelTrainer",
    "TrainConfig",
    "TrainState",
]
