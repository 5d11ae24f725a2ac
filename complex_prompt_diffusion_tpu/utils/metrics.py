"""Embedding-space distance metrics (/root/reference/cpd/metrics.py:6-21).

Used by prompt path history (prompts.py:656-666). Note euclidean_dist
reproduces the reference's formula sqrt(x^2 - y^2) exactly (which is NOT a
true euclidean distance and yields NaN where |y| > |x| — kept for parity,
with a ``true_euclidean`` alternative).
"""

from __future__ import annotations

import numpy as np

__all__ = ["spherical_dist", "euclidean_dist", "true_euclidean", "cosine_sim"]


def _normalize(x):
    x = np.asarray(x, np.float64)
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def spherical_dist(x, y, reduce: bool = False):
    x, y = _normalize(x), _normalize(y)
    d = 2.0 * np.arcsin(np.linalg.norm(x - y, axis=-1) / 2.0) ** 2
    return d.mean() if reduce else d


def euclidean_dist(x, y, reduce: bool = False):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    d = np.sqrt(x**2 - y**2)
    return d.mean() if reduce else d


def true_euclidean(x, y, reduce: bool = False):
    d = np.linalg.norm(np.asarray(x, np.float64) - np.asarray(y, np.float64), axis=-1)
    return d.mean() if reduce else d


def cosine_sim(x, y, axis: int = -1):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    num = np.sum(x * y, axis=axis)
    den = np.linalg.norm(x, axis=axis) * np.linalg.norm(y, axis=axis)
    return num / np.maximum(den, 1e-12)
