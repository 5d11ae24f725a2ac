"""Sampler registry: the reference's display-name strings -> sampler entries.

Parity target: /root/reference/cpd/samplers/registry.py:3-29 plus the
@register decorations across samplers/*.py. Names are matched
case-insensitively (including the reference's "Huen" spelling for Heun).
Unlike the reference's ``create`` there is NO ``eval`` fallback
(registry.py:20-29 — noted in SURVEY §5 as a do-not-reproduce).

Each entry: (family, sample_fn) where family is "t" (DDIM-style, drives
InferenceTables) or "sigma" (k-diffusion, drives a sigma schedule).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from complex_prompt_diffusion_tpu.samplers import ddim as _ddim
from complex_prompt_diffusion_tpu.samplers import kdiff as _k
from complex_prompt_diffusion_tpu.samplers import solver as _solver
from complex_prompt_diffusion_tpu.samplers import unipc as _unipc
from complex_prompt_diffusion_tpu.samplers import dpm_adaptive as _dpma
from complex_prompt_diffusion_tpu.samplers import loglik as _loglik
from complex_prompt_diffusion_tpu.samplers import ipndm as _ipndm

__all__ = ["SAMPLERS", "get_sampler", "register"]

SAMPLERS: Dict[str, Tuple[str, Callable]] = {}


def register(name: str, family: str):
    def deco(fn):
        SAMPLERS[name.lower()] = (family, fn)
        return fn

    return deco


def get_sampler(name: str) -> Tuple[str, Callable]:
    """Look up by the reference's display name (e.g. "DDIM", "Euler",
    "Euler Ancestral", "DPM++ 2m", "Huen", "LMS", "DPM2", "DPM Fast")."""
    key = name.lower()
    if key not in SAMPLERS:
        raise KeyError(
            f"unknown sampler {name!r}; options: {sorted(SAMPLERS)}"
        )
    return SAMPLERS[key]


# t-space family
register("DDIM", "t")(_ddim.sample_ddim)
register("PLMS", "t")(_ddim.sample_plms)

# sigma-space (k-diffusion) family — names as registered by the reference
register("Euler", "sigma")(_k.sample_euler)
register("Euler Ancestral", "sigma")(_k.sample_euler_ancestral)
register("Huen", "sigma")(_k.sample_heun)  # reference spelling (huen.py:11)
register("Heun", "sigma")(_k.sample_heun)
register("DPM2", "sigma")(_k.sample_dpm2)
register("DPM2 Ancestral", "sigma")(_k.sample_dpm2_ancestral)
register("DPM++ 2m", "sigma")(_k.sample_dpmpp_2m)
register("DPM++ 2s Ancestral", "sigma")(_k.sample_dpmpp_2s_ancestral)
register("LMS", "sigma")(_k.sample_lms)
register("DPM Fast", "sigma")(_k.sample_dpm_fast)
register("DPM Adaptive", "sigma")(_dpma.sample_dpm_adaptive)
register("Log", "sigma")(_loglik.sample_log_likelihood)  # log-likelihood estimator

# continuous-time solver family (reference registers "dpm_solver",
# samplers/solver.py:20; UniPC ships unregistered in the reference)
register("dpm_solver", "solver")(_solver.sample_dpm_solver)
register("DPM Solver", "solver")(_solver.sample_dpm_solver)
register("UniPC", "solver")(_unipc.sample_unipc)

# trig family (iPNDM's own sin^2 schedule — ipndms.py:25-30; the reference
# ships the scheduler unregistered, here it is a full sampler)
register("iPNDM", "trig")(_ipndm.sample_ipndm)

# blur-diffusion family (inverse-heat dissipation, blur.py:52-530 — the
# reference never @registers it; here it is drivable from the public API)
from complex_prompt_diffusion_tpu.samplers import blur as _blur  # noqa: E402

register("Blur", "blur")(_blur.sample_blur)
