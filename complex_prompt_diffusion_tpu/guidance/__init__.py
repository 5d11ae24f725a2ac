"""Guidance: classifier-free guidance with prompt-algebra factors,
thresholding correctors, CLIP guidance, attention-saliency guidance."""

from complex_prompt_diffusion_tpu.guidance.threshold import (
    THRESHOLDERS,
    get_thresholder,
)
from complex_prompt_diffusion_tpu.guidance.cfg import (
    GuidanceSpec,
    GuidanceConfig,
    make_denoiser,
    cfg_epsilon,
)

__all__ = [
    "THRESHOLDERS",
    "get_thresholder",
    "GuidanceSpec",
    "GuidanceConfig",
    "make_denoiser",
    "cfg_epsilon",
]
