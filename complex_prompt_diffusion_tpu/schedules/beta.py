"""Beta (forward-process variance) schedules.

Parity target: ``BetaScheduler.make_beta_schedule`` in
/root/reference/cpd/scheduler/discrete.py:185-237. All schedules are computed
in float64 numpy. One deliberate deviation: the reference rounds betas to 4
decimal places (discrete.py:237), which quantizes SD's scaled-linear schedule
(e.g. beta_start 0.00085 → 0.0008) and breaks parity with stock Stable
Diffusion; here rounding is opt-in via ``decimal_precision``.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["make_beta_schedule", "betas_for_alpha_bar"]


def betas_for_alpha_bar(
    n_timestep: int, max_beta: float = 0.999, cosine_s: float = 8e-3
) -> np.ndarray:
    """Discretize a cosine alpha-bar curve into betas (Nichol & Dhariwal).

    beta_i = 1 - alpha_bar(t_{i+1}) / alpha_bar(t_i), capped at ``max_beta``.
    Matches the "squaredcos_cap_v2" branch of the reference
    (discrete.py:155-183).
    """

    def alpha_bar(t: float) -> float:
        return math.cos((t + cosine_s) / (1 + cosine_s) * math.pi / 2) ** 2

    i = np.arange(n_timestep, dtype=np.float64)
    t1 = i / n_timestep
    t2 = (i + 1) / n_timestep
    betas = 1.0 - np.vectorize(alpha_bar)(t2) / np.vectorize(alpha_bar)(t1)
    return np.minimum(betas, max_beta)


def _warmup_betas(
    linear_start: float, linear_end: float, n_timestep: int, warmup_frac: float
) -> np.ndarray:
    betas = np.full(n_timestep, linear_end, dtype=np.float64)
    warmup_time = int(n_timestep * warmup_frac)
    betas[:warmup_time] = np.linspace(
        linear_start, linear_end, warmup_time, dtype=np.float64
    )
    return betas


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-6,
    linear_end: float = 1e-2,
    cosine_s: float = 8e-3,
    max_beta: float = 0.999,
    decimal_precision: int | None = None,
) -> np.ndarray:
    """Build a beta schedule of length ``n_timestep`` (float64).

    Supported names (reference discrete.py:192-233): ``linear``, ``quad`` /
    ``scaled_linear``, ``exp``, ``squaredcos_cap_v2``, ``sigmoid``,
    ``warmup10``, ``warmup50``, ``const``, ``jsd``, ``cosine``.

    SD 1.x/2.x use ``scaled_linear`` with linear_start=0.00085,
    linear_end=0.012 over 1000 steps.
    """
    if schedule == "linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule in ("quad", "scaled_linear"):
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "exp":
        betas = np.exp(
            np.linspace(
                np.log(linear_start), np.log(linear_end), n_timestep, dtype=np.float64
            )
        )
    elif schedule == "squaredcos_cap_v2":
        betas = betas_for_alpha_bar(n_timestep, max_beta=max_beta, cosine_s=cosine_s)
    elif schedule == "sigmoid":
        x = np.linspace(-6.0, 6.0, n_timestep, dtype=np.float64)
        betas = 1.0 / (1.0 + np.exp(-x)) * (linear_end - linear_start) + linear_start
    elif schedule == "warmup10":
        betas = _warmup_betas(linear_start, linear_end, n_timestep, 0.1)
    elif schedule == "warmup50":
        betas = _warmup_betas(linear_start, linear_end, n_timestep, 0.5)
    elif schedule == "const":
        betas = np.full(n_timestep, linear_end, dtype=np.float64)
    elif schedule == "jsd":
        # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    elif schedule == "cosine":
        timesteps = (
            np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        )
        alphas = np.cos(timesteps / (1 + cosine_s) * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
    else:
        raise NotImplementedError(f"unknown beta schedule: {schedule!r}")

    betas = np.minimum(betas, max_beta)
    if decimal_precision is not None:
        betas = np.around(betas, decimals=decimal_precision)
    return betas
