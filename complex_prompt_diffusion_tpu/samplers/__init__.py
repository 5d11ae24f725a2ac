"""Samplers: the reference's 15-sampler zoo as jit-compiled `lax.scan` loops.

Two families, as in the reference (/root/reference/cpd/samplers/):
  * t-space (DDIM/PLMS): iterate discrete timesteps against the
    InferenceTables (ddim.py, plms.py).
  * sigma-space (k-diffusion): iterate continuous sigmas through a denoised-x
    closure (euler.py, huen.py, lms.py, dpm2.py, dpmpp.py, dpm.py).

Every sampler is a pure function
``sample_*(denoise_fn, x_init, <schedule arrays>, noises, <static flags>)``
whose hot loop is a single ``lax.scan`` — the whole 50-step chain compiles to
one XLA program with donated state, replacing the reference's per-step
host<->device round-trips (ddim.py:319-322).
"""

from complex_prompt_diffusion_tpu.samplers.ddim import (
    ddim_step,
    sample_ddim,
    sample_plms,
    ddim_encode,
)
from complex_prompt_diffusion_tpu.samplers.kdiff import (
    sample_euler,
    sample_euler_ancestral,
    sample_heun,
    sample_dpm2,
    sample_dpm2_ancestral,
    sample_dpmpp_2m,
    sample_dpmpp_2s_ancestral,
    sample_lms,
    sample_dpm_fast,
)
from complex_prompt_diffusion_tpu.samplers.solver import (
    NoiseScheduleVP,
    model_wrapper,
    sample_dpm_solver,
    sample_dpm_solver_adaptive,
)
from complex_prompt_diffusion_tpu.samplers.unipc import sample_unipc
from complex_prompt_diffusion_tpu.samplers.repaint import sample_repaint
from complex_prompt_diffusion_tpu.samplers.blur import BlurDiffusion, sample_blur
from complex_prompt_diffusion_tpu.samplers.registry import (
    SAMPLERS,
    get_sampler,
    register,
)

__all__ = [
    "ddim_step",
    "sample_ddim",
    "sample_plms",
    "ddim_encode",
    "sample_euler",
    "sample_euler_ancestral",
    "sample_heun",
    "sample_dpm2",
    "sample_dpm2_ancestral",
    "sample_dpmpp_2m",
    "sample_dpmpp_2s_ancestral",
    "sample_lms",
    "sample_dpm_fast",
    "NoiseScheduleVP",
    "model_wrapper",
    "sample_dpm_solver",
    "sample_dpm_solver_adaptive",
    "sample_unipc",
    "sample_repaint",
    "BlurDiffusion",
    "sample_blur",
    "SAMPLERS",
    "get_sampler",
    "register",
]
