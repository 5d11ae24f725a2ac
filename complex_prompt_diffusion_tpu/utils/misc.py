"""Seeding and the Map attr-dict (/root/reference/cpd/util.py:427-488)."""

from __future__ import annotations

import random

import numpy as np

__all__ = ["Map", "seed_everything"]


class Map(dict):
    """dict with attribute access (util.py:427-454)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for arg in args:
            if isinstance(arg, dict):
                for k, v in arg.items():
                    self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __getattr__(self, attr):
        try:
            return self[attr]
        except KeyError as e:
            raise AttributeError(attr) from e

    def __setattr__(self, key, value):
        self[key] = value

    def __delattr__(self, item):
        del self[item]


def seed_everything(seed: int, verbose: bool = False) -> int:
    """Seed python + numpy (util.py:467-488). JAX randomness is key-based
    and flows explicitly through the pipeline (RenderConfig.seed /
    jax.random.PRNGKey) — there is no global JAX seed to set, by design."""
    random.seed(seed)
    np.random.seed(seed)
    if verbose:
        print(f"[seed_everything] {seed}")
    return seed
