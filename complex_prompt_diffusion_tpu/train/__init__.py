"""Training: diffusion losses, Adan optimizer, LR schedules, train step.

Parity targets:
  * p_losses — /root/reference/cpd/models/ddpm.py:387-414 (eps/x0/v targets,
    loss_simple + elbo weighting)
  * Adan — /root/reference/cpd/train/optimizers.py:6-138 (as an optax
    GradientTransformation)
  * LambdaWarmUpCosineScheduler(2) / LambdaLinearScheduler —
    /root/reference/cpd/train/schedulers.py:4-97
  * EMA — /root/reference/cpd/models/ema.py:5-80

The reference ships this code but no trainer (SURVEY.md §3.5: "vestigial");
here it exists primarily to make fine-tuning possible and to drive the
multi-chip training-step dry run.
"""

from complex_prompt_diffusion_tpu.train.optimizers import adan
from complex_prompt_diffusion_tpu.train.schedulers import (
    LambdaWarmUpCosineScheduler,
    LambdaWarmUpCosineScheduler2,
    LambdaLinearScheduler,
)
from complex_prompt_diffusion_tpu.train.loop import (
    p_losses,
    make_train_step,
    ema_update,
)

__all__ = [
    "adan",
    "LambdaWarmUpCosineScheduler",
    "LambdaWarmUpCosineScheduler2",
    "LambdaLinearScheduler",
    "p_losses",
    "make_train_step",
    "ema_update",
]
