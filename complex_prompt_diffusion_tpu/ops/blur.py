"""Separable Gaussian blur (NHWC), XLA depthwise convs.

Used by unconditional-guidance blur (/root/reference/cpd/samplers/ddim.py:261-266,
313-314) and attention-saliency guidance (ddim.py:190-249), which use
``torchvision.transforms.GaussianBlur(kernel_size)``. torchvision derives
sigma from the kernel size as ``0.3 * ((ksize - 1) * 0.5 - 1) + 0.8`` when
unspecified; we reproduce that default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_blur", "gaussian_kernel1d"]


def gaussian_kernel1d(kernel_size: int, sigma: float | None = None) -> np.ndarray:
    if sigma is None:
        sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    half = (kernel_size - 1) / 2
    x = np.linspace(-half, half, kernel_size)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("kernel_size", "sigma"))
def gaussian_blur(x: jax.Array, kernel_size: int = 31, sigma: float | None = None):
    """Blur [N, H, W, C] with a separable Gaussian, reflect-padded edges
    (matches torchvision's GaussianBlur default behavior)."""
    k = jnp.asarray(gaussian_kernel1d(kernel_size, sigma))
    c = x.shape[-1]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    pad = kernel_size // 2
    # depthwise: feature_group_count = C, kernel [KH, KW, 1, C]
    kh = jnp.tile(k.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    xf = jnp.pad(xf, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    xf = jax.lax.conv_general_dilated(
        xf, kh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    xf = jnp.pad(xf, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    xf = jax.lax.conv_general_dilated(
        xf, kw, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return xf.astype(dtype)
