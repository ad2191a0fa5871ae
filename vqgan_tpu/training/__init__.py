from .ema import ema_update
from .ldm_step import LDMTrainState, make_ldm_optimizer, make_ldm_train_step
from .vqgan_step import (
    VQGANTrainState,
    make_gan_optimizers,
    make_vqgan_scan_steps,
    make_vqgan_split_steps,
    make_vqgan_train_step,
)
