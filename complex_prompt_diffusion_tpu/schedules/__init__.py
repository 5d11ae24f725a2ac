"""Noise-schedule math: beta/sigma schedules, coefficient tables, timestep grids.

Everything here is host-side numpy in float64 — schedules are tiny (≤1000
elements) and precomputed once per sampling run, so there is no reason to
trace them; consumers convert the finished tables to ``jnp`` arrays that the
jit'd sampling loops index into.

Reference semantics: /root/reference/cpd/scheduler/discrete.py (SigmaScheduler,
BetaScheduler, DiscreteScheduler) — reimplemented from the underlying formulas
(DDIM arXiv:2010.02502, Karras arXiv:2206.00364, DDPM arXiv:2006.11239).
"""

from complex_prompt_diffusion_tpu.schedules.beta import make_beta_schedule
from complex_prompt_diffusion_tpu.schedules.sigma import (
    karras_sigmas,
    exponential_sigmas,
    quadratic_sigmas,
    sigmoid_sigmas,
    vp_sigmas,
    append_zero,
    make_sigma_schedule,
    sigma_to_t,
    t_to_sigma,
    karras_scalings,
)
from complex_prompt_diffusion_tpu.schedules.timesteps import (
    uniform_timesteps,
    quad_timesteps,
    jump_timesteps,
    make_timesteps,
)
from complex_prompt_diffusion_tpu.schedules.tables import (
    DiffusionTables,
    InferenceTables,
    make_diffusion_tables,
    make_inference_tables,
)

__all__ = [
    "make_beta_schedule",
    "karras_sigmas",
    "exponential_sigmas",
    "quadratic_sigmas",
    "sigmoid_sigmas",
    "vp_sigmas",
    "append_zero",
    "make_sigma_schedule",
    "sigma_to_t",
    "t_to_sigma",
    "karras_scalings",
    "uniform_timesteps",
    "quad_timesteps",
    "jump_timesteps",
    "make_timesteps",
    "DiffusionTables",
    "InferenceTables",
    "make_diffusion_tables",
    "make_inference_tables",
]
