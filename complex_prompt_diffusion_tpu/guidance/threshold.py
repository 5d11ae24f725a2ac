"""Sample/score thresholding ("ScoreCorrector") family as pure functions.

Parity target: the 8 registered algorithms in
/root/reference/cpd/samplers/extension/threshold.py:7-286. Each is a pure
``fn(x, threshold) -> x`` on [N, H, W, C]; percentile/quantile variants use
``jnp.quantile`` on-device (the reference round-trips through
``np.percentile`` on CPU every step — threshold.py:77-81).

Deviations from the reference, deliberate:
  * f32 in/out (the reference force-casts to fp16, an artifact of its
    all-fp16 pipeline).
  * ``norm_thresholding`` in the reference crashes on an undefined ``x_max``
    (threshold.py:198 — latent bug); we implement the evidently intended
    RMS-clamp form (matching CompVis ddpm.py's norm_thresholding).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

__all__ = ["THRESHOLDERS", "get_thresholder"]


def _per_sample_abs_quantile(x, q01):
    """quantile of |x| over all non-batch dims -> [N, 1, 1, 1]."""
    n = x.shape[0]
    flat = jnp.abs(x.reshape(n, -1))
    s = jnp.quantile(flat, q01, axis=1)
    return s.reshape((n,) + (1,) * (x.ndim - 1))


def _norm01(x):
    x_max, x_min = jnp.max(x), jnp.min(x)
    y = (x - x_min) / (x_max - x_min)
    return 2.0 * y - 1.0, x_max, x_min


def _denorm01(y, x_max, x_min):
    y = (y + 1.0) / 2.0
    return (x_max - x_min) * y + x_min


def none_thresholding(x, threshold=None):
    return x


def static_thresholding(x, threshold=1.0):
    """clamp to [-threshold, threshold] (threshold.py:47-62)."""
    return jnp.clip(x, -threshold, threshold)


def dynamic_thresholding(x, threshold=99.66):
    """Imagen-style: clamp at the global max of per-sample |x| percentiles,
    floored at 1.0 (threshold.py:63-86; percentile given in [0,100])."""
    s = _per_sample_abs_quantile(x, threshold / 100.0)
    s = jnp.maximum(jnp.max(s), 1.0)
    return jnp.clip(x, -s, s)


def dynanormic_thresholding(x, threshold=99.66):
    """Per-sample quantile clamp + renormalize by s (threshold.py:87-117)."""
    q = threshold / 100.0 if 1.0 < threshold <= 100.0 else threshold
    s = jnp.maximum(_per_sample_abs_quantile(x, q), 1.0)
    return jnp.clip(x, -s, s) / s


def scaled_dynamic_perc_thresholding(x, threshold=99.66):
    """dynamic_thresholding applied in [-1,1]-normalized space
    (threshold.py:118-146)."""
    y, x_max, x_min = _norm01(x)
    s = jnp.maximum(jnp.max(_per_sample_abs_quantile(y, threshold / 100.0)), 1.0)
    y = jnp.clip(y, -s, s)
    return _denorm01(y, x_max, x_min)


def renorm_thresholding(x, threshold=99.66):
    """Per-sample quantile clamp in normalized space (threshold.py:147-178)."""
    y, x_max, x_min = _norm01(x)
    q = threshold / 100.0 if 1.0 < threshold <= 100.0 else threshold
    s = jnp.maximum(_per_sample_abs_quantile(y, q), 1.0)
    y = jnp.clip(y, -s, s)
    return _denorm01(y, x_max, x_min)


def norm_thresholding(x, threshold=0.9966):
    """RMS clamp: s = max(RMS(x), threshold); x * threshold / s.

    The reference's version (threshold.py:179-202) references an undefined
    variable; this is the intended CompVis form.
    """
    n = x.shape[0]
    s = jnp.sqrt(jnp.mean(x.reshape(n, -1) ** 2, axis=1))
    s = jnp.maximum(s, threshold).reshape((n,) + (1,) * (x.ndim - 1))
    return x * (threshold / s)


def scaled_norm_thresholding(x, threshold=99.66):
    """norm_thresholding in normalized space, threshold scaled by the
    normalized max (threshold.py:203-231)."""
    y, x_max, x_min = _norm01(x)
    th = threshold / 100.0 * jnp.max(y)
    n = y.shape[0]
    s = jnp.sqrt(jnp.mean(y.reshape(n, -1) ** 2, axis=1))
    s = jnp.maximum(s, th).reshape((n,) + (1,) * (y.ndim - 1))
    y = y * (th / s)
    return _denorm01(y, x_max, x_min)


def spatial_norm_thresholding(x, threshold=99.66):
    """Per-pixel channel-RMS clamp (threshold.py:232-249). NHWC: the channel
    axis is -1 (the reference's dim=1 is channels in NCHW)."""
    s = jnp.sqrt(jnp.mean(x**2, axis=-1, keepdims=True))
    s = jnp.maximum(s, threshold)
    return x * (threshold / s)


def scaled_spatial_norm_thresholding(x, threshold=99.66):
    """spatial_norm_thresholding in normalized space (threshold.py:250-286)."""
    y, x_max, x_min = _norm01(x)
    th = threshold / 100.0 * jnp.max(y)
    s = jnp.sqrt(jnp.mean(y**2, axis=-1, keepdims=True))
    s = jnp.maximum(s, th)
    y = y * (th / s)
    return _denorm01(y, x_max, x_min)


THRESHOLDERS: Dict[str, Callable] = {
    "none": none_thresholding,
    "static_thresholding": static_thresholding,
    "dynamic_thresholding": dynamic_thresholding,
    "dynanormic_thresholding": dynanormic_thresholding,
    "scaled_dynamic_perc_thresholding": scaled_dynamic_perc_thresholding,
    "renorm_thresholding": renorm_thresholding,
    "norm_thresholding": norm_thresholding,
    "scaled_norm_thresholding": scaled_norm_thresholding,
    "spatial_norm_thresholding": spatial_norm_thresholding,
    "scaled_spatial_norm_thresholding": scaled_spatial_norm_thresholding,
}


def get_thresholder(name: str) -> Callable:
    if name not in THRESHOLDERS:
        raise KeyError(
            f"unknown thresholding algorithm {name!r}; options: {sorted(THRESHOLDERS)}"
        )
    return THRESHOLDERS[name]


def dynamic_clip(x, threshold=99.5):
    """Post-CFG dynamic scale clip: divide by the max per-sample percentile,
    floored at 1 (reference ddim.py:817-820)."""
    s = _per_sample_abs_quantile(x, threshold / 100.0)
    s = jnp.maximum(jnp.max(s), 1.0)
    return x / s
