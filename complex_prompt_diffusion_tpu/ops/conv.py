"""Pallas 3x3 stride-1 conv kernel (shifted-matmul formulation).

The UNet's 3x3 convs are where most non-attention FLOPs live (reference
unet.py ResBlock convs). XLA's own conv reaches 55-60% of the chip's
square-matmul rate at the bench batch (docs/PERF.md "Conv-path
measurement"); this kernel reformulates the conv as nine accumulated
[M, C] x [C, Co] matmuls — the exact regime the MXU runs at its ~67%
practical ceiling — with zero im2col materialization:

* x is padded by TWO zero rows top+bottom (covers the max flat shift
  W+1) and the (H, W) plane is flattened onto sublanes. W is a multiple
  of 8 at every SD level (64/32/16/8), so the reshape is a free view.
* tap (dy, dx) of the kernel contributes ``x_flat[m + (dy-1)*W + (dx-1)]``
  to output row m: a statically shifted M-slice of the SAME VMEM-resident
  input, no halo exchange, no overlap blocking.
* the dx = 0/2 shifts wrap across image rows at w = 0 / W-1; the wrapped
  source rows are exactly the rows that should read zero padding, so a
  ``m % W`` row mask both fixes the wrap and implements W-padding.
* accumulation is f32 in VMEM over the 9 taps; output cast back to the
  stream dtype with the bias folded in.

Backward is XLA-recompute (custom VJP) like ops/attention.py and
ops/mlp.py, so guidance gradients (`jax.grad` through the UNet) compose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "conv3x3_supported"]


def _kernel(xp_ref, k_ref, b_ref, o_ref, *, H, W, C, Hb, co):
    # xp_ref: [1, H+4, W, C] -> free view [(H+4)*W, C] (W % 8 == 0)
    xp = xp_ref[...].reshape((H + 4) * W, C)
    kw = k_ref[...]  # [3, 3, C, co]
    bias = b_ref[...]  # [1, co]

    m_iota = jax.lax.broadcasted_iota(jnp.int32, (Hb * W, 1), 0)
    col = m_iota % W
    mask_l = (col != 0).astype(xp.dtype)      # dx=0: source w'=W-1 wrap rows
    mask_r = (col != W - 1).astype(xp.dtype)  # dx=2: source w'=0 wrap rows

    for hb in range(H // Hb):
        acc = jnp.zeros((Hb * W, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                base = 2 * W + hb * Hb * W + (dy - 1) * W + (dx - 1)
                xs = jax.lax.slice(xp, (base, 0), (base + Hb * W, C))
                if dx == 0:
                    xs = xs * mask_l
                elif dx == 2:
                    xs = xs * mask_r
                acc = acc + jax.lax.dot_general(
                    xs, kw[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        o_ref[0, hb * Hb : (hb + 1) * Hb, :, :] = (
            (acc + bias).astype(o_ref.dtype).reshape(Hb, W, co)
        )


def conv3x3_supported(
    x_shape, k_shape, stride: int, padding, itemsize: int = 2
) -> bool:
    """Dispatch guard: stride-1 3x3 'same' convs on flattenable planes.

    ``itemsize`` is the activation dtype's byte width (2 for bf16 — the SD
    inference path; pass 4 for f32 activations so the VMEM budget is real).
    """
    if stride != 1 or padding not in (None, 1):
        return False
    if len(k_shape) != 4 or k_shape[0] != 3 or k_shape[1] != 3:
        return False
    b, h, w, c = x_shape
    if w % 8 != 0 or h < 8 or w < 8:
        return False
    co_full = k_shape[3]
    if (h + 4) * w * c * itemsize > 8 * 1024 * 1024:
        return False
    return _pick_blocks(h, w, c, co_full, itemsize) is not None


def _pick_blocks(H: int, W: int, C: int, Co: int, itemsize: int = 2):
    """(Hb, co) block sizes, or None when no co chunk fits the VMEM budget
    (callers fall back to the XLA conv)."""
    # h-block: target M = Hb*W near 1024 rows
    Hb = max(1, min(H, 1024 // W))
    while H % Hb != 0:
        Hb -= 1
    # co chunk: bound weights (9*C*co*itemsize) + acc (Hb*W*co*4) to ~6 MB,
    # AND bound the whole-kernel footprint (double-buffered padded input +
    # double-buffered chunk) to 12 MB of the 16 MB scoped-VMEM limit. The
    # 4 MB headroom is for allocations the guard cannot see: XLA may park
    # the conv *output* in scoped VMEM next to the kernel stack (measured:
    # 32x32x1280->640 at est. 12.8 MB OOMed at 16.13 MB in-model; every
    # config admitted by the 12 MB rule compiles and runs in-model).
    # Mosaic requires the blocked last dim to be a multiple of 128 (or the
    # full extent), so candidates are 128-multiples dividing Co, else full.
    xp = (H + 4) * W * C * itemsize

    def fits(co):
        chunk = 9 * C * co * itemsize + Hb * W * co * 4
        return (
            chunk <= 6 * 1024 * 1024
            and 2 * (xp + chunk) <= 12 * 1024 * 1024
        )

    candidates = [Co] + [
        c for c in (640, 512, 384, 256, 128)
        if c < Co and Co % c == 0 and c % 128 == 0
    ]
    for co in candidates:
        if fits(co):
            return Hb, co
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_fwd(x, kernel, bias, *, interpret=False):
    B, H, W, C = x.shape
    Co = kernel.shape[3]
    picked = _pick_blocks(H, W, C, Co, jnp.dtype(x.dtype).itemsize)
    if picked is None:
        # no co chunk fits the VMEM budget — direct callers (bypassing
        # conv3x3_supported) get the XLA conv instead of a VMEM failure
        return _xla_conv(x, kernel, bias)
    Hb, co = picked
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    kern = kernel.astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, Hb=Hb, co=co),
        grid=(B, Co // co),
        in_specs=[
            pl.BlockSpec((1, H + 4, W, C), lambda b, j: (b, 0, 0, 0)),
            pl.BlockSpec((3, 3, C, co), lambda b, j: (0, 0, 0, j)),
            pl.BlockSpec((1, co), lambda b, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, H, W, co), lambda b, j: (b, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xp, kern, bias.astype(jnp.float32).reshape(1, -1))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3(x, kernel, bias, interpret=False):
    """3x3 stride-1 'same' conv, NHWC x HWIO -> NHWC (+bias)."""
    return _conv3x3_fwd(x, kernel, bias, interpret=interpret)


def _xla_conv(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(x.dtype)


def _fwd(x, kernel, bias, interpret):
    return conv3x3(x, kernel, bias, interpret), (x, kernel, bias)


def _bwd(interpret, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(_xla_conv, x, kernel, bias)
    return vjp(g)


conv3x3.defvjp(_fwd, _bwd)
