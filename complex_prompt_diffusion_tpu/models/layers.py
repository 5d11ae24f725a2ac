"""Primitive layers: conv / linear / norms / embeddings as pure functions.

Params are plain dicts of arrays. Conv kernels are HWIO (TPU layout); the
torch-checkpoint loader (models/params.py) transposes from OIHW. Norm layers
compute statistics in f32 regardless of activation dtype, matching the
reference's GroupNorm32 behavior (/root/reference/cpd/models/util.py:103-105).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu.ops import group_norm, group_norm_silu
from complex_prompt_diffusion_tpu.ops.conv import conv3x3, conv3x3_supported


# Pallas conv flag, read ONCE at import time: conv2d dispatch happens at
# trace time inside jitted model functions and the jit cache is keyed only
# on shapes, so a per-call env read would silently go stale after the first
# trace. Import-time capture makes the semantics explicit: set the env var
# before importing the package (tests that need both paths reload or call
# ops.conv.conv3x3 directly).
#
# Values: "auto" (default) routes stride-1 3x3 convs on 16x16/32x32 planes
# to the Pallas shifted-matmul kernel at UNet batch <= 4, where it beats
# XLA's conv 1.15-1.38x (scripts/perf_conv3.py, min-of-3 whole-loop timing:
# B2 1.21x/1.30x, B4 1.15x/1.38x at 32^2/16^2; loses at 8^2 at every batch
# and everywhere at B8). "1" forces the kernel wherever conv3x3_supported
# admits it; "0" disables it.
import os as _os

_PALLAS_CONV = _os.environ.get("CPD_TPU_PALLAS_CONV", "auto")

# Tap-sum conv3x3: nine statically-shifted [B,H,W,C]x[C,Co] dot_generals over
# one padded copy (no im2col materialization). Pure-XLA alternative lowering
# measured against XLA's native conv (scripts/perf_conv4.py, min-of-3 whole
# fori_loop): wins ONLY on the starved 64^2 plane at small batch (B2 1.05x;
# B8 0.60x), ties/loses everywhere else — including every LARGER plane
# (B4: 128^2 0.63-0.65x, 256^2 0.42x, 512^2 0.33x — `perf_conv4.py 4 big`),
# so the gate matches the measured win exactly instead of extrapolating
# upward. "auto" routes 64^2 stride-1 3x3 at UNet batch <= 4; "0" disables;
# "1" forces it for every stride-1 3x3.
_TAPSUM_CONV = _os.environ.get("CPD_TPU_TAPSUM_CONV", "auto")

# conv1x1 as a plain channel contraction (dot_general) instead of XLA's
# conv lowering — A/B probe flag (docs/PERF.md round 3)
_CONV1X1_DOT = _os.environ.get("CPD_TPU_CONV1X1_DOT", "0") == "1"

# subpixel decoder upsample: conv3x3(nearest2x(x)) computed as four
# per-phase 2x2 convs on the SMALL plane (16 taps on HxW vs 9 taps on
# 4HW = 2.25x fewer FLOPs, algebraically exact — nearest-neighbor
# duplicates collapse into summed kernel taps). "auto" = on for TPU.
_SUBPIXEL_UP = _os.environ.get("CPD_TPU_SUBPIXEL_UP", "auto")


def _pallas_conv_wanted(x_shape) -> bool:
    if _PALLAS_CONV == "1":
        return True
    if _PALLAS_CONV == "auto":
        b, h, w, _ = x_shape
        return b <= 4 and 256 <= h * w <= 1024
    return False


def _tapsum_conv_wanted(x_shape) -> bool:
    if _TAPSUM_CONV == "1":
        return True
    if _TAPSUM_CONV == "auto":
        b, h, w, _ = x_shape
        return b <= 4 and h * w == 4096
    return False


def _tapsum_conv3x3(x, kernel, bias):
    """stride-1 'same' 3x3 conv as a sum of 9 shifted channel contractions.

    Each tap is a static slice of ONE padded copy contracted on the MXU like
    a plain matmul (f32 accumulation, matching XLA conv's accumulator)."""
    b, h, w, _ = x.shape
    kernel = kernel.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dh in range(3):
        for dw in range(3):
            xs = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(xp, dh, dh + h, axis=1), dw, dw + w, axis=2
            )
            t = jax.lax.dot_general(
                xs,
                kernel[dh, dw],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    return (acc + bias.astype(jnp.float32)).astype(x.dtype)

def conv3x3_after_upsample2x(params, x):
    """``conv2d(params, upsample_nearest2x(x))`` without materializing the
    upsampled plane: per output phase (p_h, p_w) ∈ {0,1}², the nearest-2x
    duplication collapses the 3×3 taps onto ≤2×2 distinct small-plane
    pixels, with kernels formed by summing the collapsed taps. Exact up to
    f32 summation order; 16 small-plane contractions replace 9 big-plane
    ones (2.25× fewer FLOPs) and every dot rides the MXU like a matmul
    (same regime as the tap-sum conv above).

    Derivation: output row 2i+p reads upsampled rows 2i+p+dh-1, which map
    to source rows floor((2i+p+dh-1)/2) — for p=0 that is {i-1: dh=0,
    i: dh∈{1,2}}, for p=1 {i: dh∈{0,1}, i+1: dh=2}; columns identically.
    """
    k = params["kernel"]
    b, h, w, _ = x.shape
    co = k.shape[-1]
    kf = k.astype(jnp.float32)
    # phase -> {padded-offset: contributing tap indices}; pad=1, so padded
    # offset o reads source index i + o - 1
    taps = {0: {0: (0,), 1: (1, 2)}, 1: {1: (0, 1), 2: (2,)}}
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    phases = []
    for ph in (0, 1):
        for pw in (0, 1):
            acc = None
            for oh, dhs in taps[ph].items():
                for ow, dws in taps[pw].items():
                    k2 = sum(kf[dh, dw] for dh in dhs for dw in dws)
                    xs = jax.lax.slice_in_dim(
                        jax.lax.slice_in_dim(xp, oh, oh + h, axis=1),
                        ow, ow + w, axis=2,
                    )
                    t = jax.lax.dot_general(
                        xs, k2.astype(x.dtype),
                        (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = t if acc is None else acc + t
            phases.append(acc + params["bias"].astype(jnp.float32))
    y = jnp.stack(phases, axis=-2).reshape(b, h, w, 2, 2, co)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, co)
    return y.astype(x.dtype)


def subpixel_up_wanted(kernel_shape) -> bool:
    if _SUBPIXEL_UP == "0":
        return False
    if _SUBPIXEL_UP == "1":
        return kernel_shape[0] == 3 and kernel_shape[1] == 3
    return (
        kernel_shape[0] == 3
        and kernel_shape[1] == 3
        and jax.default_backend() == "tpu"
    )


__all__ = [
    "init_conv",
    "conv2d",
    "conv3x3_after_upsample2x",
    "subpixel_up_wanted",
    "init_linear",
    "linear",
    "init_group_norm",
    "init_layer_norm",
    "layer_norm",
    "timestep_embedding",
    "silu",
    "gelu",
    "upsample_nearest2x",
    "avg_pool2x",
]


def as_np_rng(key) -> "np.random.Generator":
    """Convert a jax PRNG key / int / Generator into a numpy Generator.

    Init runs host-side in numpy: random weights are only used for tests and
    demos (real weights come from checkpoints), and eager jax dispatch per
    layer costs a compile each on first use.
    """
    import numpy as np

    if isinstance(key, np.random.Generator):
        return key
    if hasattr(key, "dtype"):  # jax typed key or uint32 key array
        import jax.random as jr

        try:
            data = jr.key_data(key)
        except Exception:
            data = key
        entropy = [int(x) for x in np.asarray(data).ravel()]
        return np.random.default_rng(np.random.SeedSequence(entropy))
    return np.random.default_rng(key)


def init_conv(key, in_ch: int, out_ch: int, kernel: int = 3, zero: bool = False):
    """Conv2d params {kernel: [KH,KW,I,O], bias: [O]}; uniform fan-in init
    (torch Conv2d default is kaiming-uniform — only used for random tests).

    Returns HOST numpy leaves: on the tunneled TPU backend every eager
    ``jnp`` array creation is a separate RPC (~0.3 s each), so init builds
    the whole tree host-side and the top-level ``init_*`` entry points
    commit it with ONE ``jax.device_put``."""
    import numpy as np

    if zero:
        w = np.zeros((kernel, kernel, in_ch, out_ch), np.float32)
    else:
        rng = as_np_rng(key)
        fan_in = in_ch * kernel * kernel
        bound = 1.0 / math.sqrt(fan_in)
        w = rng.uniform(
            -bound, bound, (kernel, kernel, in_ch, out_ch)
        ).astype(np.float32)
    return {"kernel": w, "bias": np.zeros((out_ch,), np.float32)}


def conv2d(params, x, stride: int = 1, padding=None):
    """Conv with torch-style symmetric padding. Default pad = (k-1)//2, which
    reproduces torch Conv2d(padding=k//2) for odd k at any stride — explicit
    padding, NOT XLA "SAME" (which misaligns at stride 2).

    Stride-1 3x3 'same' convs route to the Pallas shifted-matmul kernel
    (ops/conv.py) where it measures faster than XLA's conv: small batches
    (UNet B<=4) on 16^2/32^2 planes (see _pallas_conv_wanted). At the
    throughput batch (B=8) XLA's conv runs at 59-73% SOL — effectively the
    chip's matmul ceiling — and keeps every site (perf_conv3.py)."""
    dtype = x.dtype
    k = params["kernel"].shape[0]
    if _CONV1X1_DOT and k == 1 and stride == 1 and not padding:
        y = jax.lax.dot_general(
            x, params["kernel"].astype(dtype)[0, 0],
            (((3,), (0,)), ((), ())),
        )
        return y + params["bias"].astype(dtype)
    if (
        _pallas_conv_wanted(x.shape)
        and jax.default_backend() == "tpu"
        and conv3x3_supported(
            x.shape, params["kernel"].shape, stride, padding,
            jnp.dtype(dtype).itemsize,
        )
    ):
        return conv3x3(x, params["kernel"], params["bias"])
    if (
        k == 3
        and stride == 1
        and (padding is None or padding == 1)
        and params["kernel"].shape[1] == 3
        and _tapsum_conv_wanted(x.shape)
        and jax.default_backend() == "tpu"
    ):
        return _tapsum_conv3x3(x, params["kernel"], params["bias"])
    if padding is None:
        padding = (k - 1) // 2
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"].astype(dtype),
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["bias"].astype(dtype)


def init_linear(key, in_f: int, out_f: int, bias: bool = True, zero: bool = False):
    # host numpy leaves — see init_conv docstring
    import numpy as np

    if zero:
        w = np.zeros((in_f, out_f), np.float32)
    else:
        rng = as_np_rng(key)
        bound = 1.0 / math.sqrt(in_f)
        w = rng.uniform(-bound, bound, (in_f, out_f)).astype(np.float32)
    p = {"kernel": w}
    if bias:
        p["bias"] = np.zeros((out_f,), np.float32)
    return p


def linear(params, x):
    dtype = x.dtype
    y = jnp.dot(x, params["kernel"].astype(dtype))
    if "bias" in params:
        y = y + params["bias"].astype(dtype)
    return y


def init_group_norm(ch: int):
    import numpy as np

    return {"scale": np.ones((ch,), np.float32), "bias": np.zeros((ch,), np.float32)}


def init_layer_norm(ch: int):
    import numpy as np

    return {"scale": np.ones((ch,), np.float32), "bias": np.zeros((ch,), np.float32)}


def layer_norm(params, x, eps: float = 1e-5):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(dtype)


def group_norm_p(params, x, num_groups: int = 32, eps: float = 1e-5, use_pallas=None):
    return group_norm(
        x, params["scale"], params["bias"], num_groups, eps, use_pallas
    )


def group_norm_silu_p(params, x, num_groups: int = 32, eps: float = 1e-5, use_pallas=None):
    return group_norm_silu(
        x, params["scale"], params["bias"], num_groups, eps, use_pallas
    )


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, CompVis ordering [cos | sin]
    (/root/reference/cpd/models/util.py:65-85 — note diffusers uses
    [sin | cos]; the order matters for weight parity). f32 output."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def upsample_nearest2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def avg_pool2x(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
