"""UniPC: unified predictor-corrector sampler.

Parity target: /root/reference/cpd/samplers/uni_pc.py:9-588 (the UniPC
reference port; Zhao et al., arXiv:2302.04867). Implemented in the
data-prediction (x0) form with the B(h) variants ``bh1`` (B_h = h) and
``bh2`` (B_h = expm1(h)), multistep orders 1-3, optional corrector
(UniC) after each predictor step, ``lower_order_final``.

Uses the same :class:`~.solver.NoiseScheduleVP` and wrapped model as
DPM-Solver. The tiny R-matrix solves for the rho coefficients run in host
numpy at trace time (the time grid is static).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from complex_prompt_diffusion_tpu.samplers.solver import (
    NoiseScheduleVP,
    _time_steps,
)

__all__ = ["sample_unipc"]


def _uni_coeffs(rks: List[float], hh: float, variant: str, corrector: bool):
    """Solve for rho coefficients. rks are the (static) lambda-ratio knots;
    returns numpy vector rhos (length = len(rks) [+1 for corrector])."""
    rks = list(rks)
    if corrector:
        rks.append(1.0)
    rks_np = np.asarray(rks, np.float64)

    K = len(rks_np)
    # b_k = k! * phi_{k+1}(hh) terms, with the bh variant scaling
    h_phi_1 = math.expm1(hh)
    if variant == "bh1":
        B_h = hh
    elif variant == "bh2":
        B_h = h_phi_1
    else:
        raise ValueError(variant)

    R = []
    b = []
    h_phi_k = h_phi_1 / hh - 1.0
    factorial_i = 1.0
    for i in range(1, K + 1):
        R.append(rks_np ** (i - 1))
        b.append(h_phi_k * factorial_i / B_h)
        factorial_i *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / factorial_i

    R = np.stack(R)  # [K, K]
    b = np.asarray(b)
    if K == 1:
        rhos = np.asarray([0.5]) if corrector else b[:1] / R[0, :1]
        if corrector:
            rhos = np.asarray([0.5])
    else:
        rhos = np.linalg.solve(R, b)
    return rhos, B_h


def sample_unipc(
    model_fn: Callable,
    x: jax.Array,
    noise_schedule: NoiseScheduleVP,
    steps: int = 20,
    order: int = 2,
    skip_type: str = "time_uniform",
    variant: str = "bh2",
    use_corrector: bool = True,
    lower_order_final: bool = True,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
):
    """Sample with UniPC. model_fn(x, t_continuous) -> eps prediction."""
    ns = noise_schedule
    t_T = t_start if t_start is not None else ns.T
    t_0 = t_end if t_end is not None else 1.0 / ns.total_N
    ts = _time_steps(ns, skip_type, t_T, t_0, steps)

    def lam(t):
        return ns.lambda_np(float(t))

    def alpha(t):
        return ns.alpha_np(float(t))

    def sigma(t):
        return ns.std_np(float(t))

    def x0_of(x_in, t):
        eps = model_fn(x_in, jnp.asarray(t, jnp.float32))
        return (x_in - sigma(t) * eps) / alpha(t)

    def unipc_update(x_prev0, t_prev_list, model_prev_list, t, cur_order):
        """One predictor(+corrector) update from t_prev_list[-1] to t."""
        t_prev_0 = t_prev_list[-1]
        m_prev_0 = model_prev_list[-1]
        lambda_prev_0 = lam(t_prev_0)
        lambda_t = lam(t)
        h = lambda_t - lambda_prev_0
        hh = -h  # data-prediction mode

        rks = []
        D1s = []
        for i in range(1, cur_order):
            t_i = t_prev_list[-(i + 1)]
            m_i = model_prev_list[-(i + 1)]
            r_i = (lam(t_i) - lambda_prev_0) / h
            rks.append(r_i)
            D1s.append((m_i - m_prev_0) / r_i)

        h_phi_1 = math.expm1(hh)
        alpha_t, sigma_t_, sigma_prev = alpha(t), sigma(t), sigma(t_prev_0)
        x_t_base = (sigma_t_ / sigma_prev) * x_prev0 - alpha_t * h_phi_1 * m_prev_0

        # predictor
        if rks:
            rhos_p, B_h = _uni_coeffs(rks, hh, variant, corrector=False)
            pred_res = sum(float(r) * d for r, d in zip(rhos_p, D1s))
            x_t = x_t_base - alpha_t * B_h * pred_res
        else:
            _, B_h = _uni_coeffs([1.0], hh, variant, corrector=False)
            x_t = x_t_base

        if not use_corrector:
            return x_t, None

        # corrector: evaluate the model at the predicted point
        m_t = x0_of(x_t, t)
        rhos_c, B_h = _uni_coeffs(rks, hh, variant, corrector=True)
        corr_res = sum(float(r) * d for r, d in zip(rhos_c[:-1], D1s)) if D1s else 0.0
        D1_t = m_t - m_prev_0
        x_t = x_t_base - alpha_t * B_h * (corr_res + float(rhos_c[-1]) * D1_t)
        return x_t, m_t

    t_prev_list = [float(ts[0])]
    model_prev_list = [x0_of(x, float(ts[0]))]

    for i in range(steps):
        t = float(ts[i + 1])
        cur_order = min(order, i + 1)
        if lower_order_final:
            cur_order = min(cur_order, steps - i)
        cur_order = max(1, min(cur_order, len(model_prev_list)))
        x, m_t = unipc_update(x, t_prev_list, model_prev_list, t, cur_order)
        if m_t is None and i < steps - 1:
            m_t = x0_of(x, t)
        t_prev_list.append(t)
        model_prev_list.append(m_t)
        t_prev_list = t_prev_list[-3:]
        model_prev_list = model_prev_list[-3:]
    return x
