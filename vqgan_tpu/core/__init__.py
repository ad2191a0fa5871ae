from .schedules import (
    DiffusionSchedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_beta_schedule,
    make_schedule,
    sigmoid_beta_schedule,
)
from .diffusion_math import (
    ddim_step,
    extract,
    normalize_to_neg_one_to_one,
    predict_noise_from_start,
    predict_start_from_noise,
    predict_start_from_v,
    predict_v,
    q_posterior,
    q_sample,
    unnormalize_to_zero_to_one,
)
from .guidance import apply_cfg, project
