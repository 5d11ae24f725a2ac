"""Inference timestep discretization (uniform / quad / RePaint jumps).

Parity target: ``DiscreteScheduler._make_timesteps`` and ``_add_jumps``
(/root/reference/cpd/scheduler/discrete.py:483-532). Timesteps are ascending
arrays of trained-timestep indices; sampling loops iterate them reversed.
"""

from __future__ import annotations

import numpy as np

__all__ = ["uniform_timesteps", "quad_timesteps", "jump_timesteps", "make_timesteps"]


def uniform_timesteps(num_steps: int, num_train_timesteps: int = 1000) -> np.ndarray:
    """range(0, T, T//S) — the DDIM uniform grid (discrete.py:488-490)."""
    return np.arange(0, num_train_timesteps, num_train_timesteps // num_steps)


def quad_timesteps(num_steps: int, num_train_timesteps: int = 1000) -> np.ndarray:
    """Quadratic spacing over the first 80% of the chain (discrete.py:491-493)."""
    return (
        np.linspace(0, np.sqrt(num_train_timesteps * 0.8), num_steps) ** 2
    ).astype(np.int64)


def jump_timesteps(
    num_steps: int,
    num_train_timesteps: int = 1000,
    jump_length: int = 10,
    jump_n_sample: int = 10,
) -> np.ndarray:
    """RePaint-style resampling walk (Lugmayr et al. 2022, alg. 2;
    reference discrete.py:512-532).

    Returns the *descending* time walk (with forward jumps interleaved),
    scaled into trained-timestep units. Unlike the other grids this is a
    walk, not a grid — callers must NOT flip it again.
    """
    jumps = {}
    for j in range(0, num_steps - jump_length, jump_length):
        jumps[j] = jump_n_sample - 1

    timesteps = []
    t = num_steps
    while t >= 1:
        t -= 1
        timesteps.append(t)
        if jumps.get(t, 0) > 0:
            jumps[t] -= 1
            for _ in range(jump_length):
                t += 1
                timesteps.append(t)

    return np.array(timesteps) * (num_train_timesteps // num_steps)


def make_timesteps(
    num_steps: int,
    method: str = "uniform",
    num_train_timesteps: int = 1000,
    **kwargs,
) -> np.ndarray:
    """Discretize, then shift by +1 "to get the final alpha values right"
    (reference discrete.py:504-507), clamping the last entry below T.
    """
    if method == "uniform":
        timesteps = uniform_timesteps(num_steps, num_train_timesteps)
    elif method == "quad":
        timesteps = quad_timesteps(num_steps, num_train_timesteps)
    elif method == "jumps":
        timesteps = jump_timesteps(
            num_steps,
            num_train_timesteps,
            jump_length=kwargs.get("jump_length", 10),
            jump_n_sample=kwargs.get("jump_n_sample", 10),
        )
    else:
        raise NotImplementedError(f"unknown discretization method: {method!r}")

    steps_out = timesteps + 1
    if steps_out[-1] == num_train_timesteps:
        steps_out[-1] -= 1
    return steps_out
