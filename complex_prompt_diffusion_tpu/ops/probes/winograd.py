"""Pallas Winograd F(2x2,3x3) conv kernel.

The per-component budget (docs/PERF.md round 3) put conv3x3 at 18.8 ms of
the 60.3 ms batch-4 CFG step with XLA's direct conv at 59-75% SOL — "the
chip's matmul ceiling". That ceiling is measured against DIRECT-conv
FLOPs (9 MACs per output point). Winograd F(2x2,3x3) computes the same
conv with 16 MACs per 2x2 output tile = 4 per point — 2.25x fewer MXU
FLOPs — at the price of add-only tile transforms, which the VPU overlaps
with MXU work. XLA:TPU does not use Winograd (scripts/perf_winograd.py:
an XLA-level formulation loses because the transformed tiles round-trip
HBM); this kernel keeps everything in VMEM.

Replaces the same reference surface as ops/conv.py (the ResBlock convs of
/root/reference/cpd/models/unet.py); which kernel a site uses is purely a
dispatch decision in models/layers.py.

Layout strategy (no strided VMEM access anywhere):

* pad x by 1 left/top and 3 bottom/1 right: [H+4, W+2] with H, W even, so
  the padded plane splits into 2x2 phase planes of [(H/2)+2, (W/2)+1]
  (the extra all-zero plane row keeps the flat-view shifts below in
  bounds for the k>=2, l>=2 taps).
* input tile element (i, j) of output tile (ti, tj) sits at padded coords
  (2*ti + i, 2*tj + j) = phase plane (i%2, j%2) at block coords
  (ti + i//2, tj + j//2) — sixteen CONTIGUOUS shifted slices of four
  de-interleaved planes. The de-interleave happens outside the kernel (one
  cheap XLA transpose in HBM); the shifts happen inside on the flat
  [(TH+2)*(TW+1), C] view: tap (k, l) of flat tile t is flat element
  t + (k//2)*(TW+1) + (l//2), with column wrap landing in the junk
  column.
* flattening tile rows keeps one junk column per row (the tj = TW block
  column). It is carried through the matmuls (1/(TW+1) wasted rows: 3-11%)
  and lands on output columns W and W+1, which the caller crops — the same
  wrap trick ops/conv.py uses, moved to tile space.
* B^T d B is 32 VPU add/sub passes over [M, C] (B^T rows have two +/-1
  entries); U = G g G^T is precomputed OUTSIDE (f32, exact halves) and fed
  as a [16, C, Co] operand; A^T M A folds into four running f32
  accumulators Y_ab += A[i,a]*A[j,b] * M_ij as each of the 16 matmuls
  retires (coefficients in {0, +/-1}: 9 live terms per output).
* the 16 matmuls are [TH*(TW+1), C] x [C, co] with f32 accumulation — the
  square-ish regime the MXU likes, same as ops/conv.py's shifted matmuls
  but on quarter the M rows each.

Numerics: transforms are +/-1 adds (exact in f32; ~1 ulp in bf16), the
weight transform's halves are exact in both. Measured bf16 deviation vs
the XLA bf16 conv is ~5e-3 relative — the same order as the bf16 conv's
own deviation from f32.

Backward is XLA-recompute (custom VJP) like ops/conv.py, so guidance
gradients compose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["wino3x3", "wino3x3_supported", "winograd_weights"]

# G for F(2x2,3x3): exact in bf16/f32 except the halves (exact in f32).
_G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
    np.float32,
)
# A^T rows (output transform): y0 = m0+m1+m2, y1 = m1-m2-m3
_AT = np.array([[1.0, 1.0, 1.0, 0.0], [0.0, 1.0, -1.0, -1.0]], np.float32)


def winograd_weights(kernel):
    """[3, 3, C, Co] -> U = G g G^T as [16, C, Co] (f32 math)."""
    g32 = kernel.astype(jnp.float32)
    u = jnp.einsum("ik,klcf->ilcf", jnp.asarray(_G), g32)
    u = jnp.einsum("ilcf,jl->ijcf", u, jnp.asarray(_G))
    return u.reshape(16, kernel.shape[2], kernel.shape[3])


def _wino_kernel(ph_ref, u_ref, b_ref, o_ref, *, TH, TW, C, co):
    """Grid: (B, Co/co). ph_ref: [1, 2, 2, TH+2, TW+1, C] phase planes;
    u_ref: [16, C, co]; o_ref: [1, 2*TH, 2*(TW+1), co]."""
    M = TH * (TW + 1)
    bias = b_ref[...]  # [1, co]

    phases = [
        [
            ph_ref[0, a, b].reshape((TH + 2) * (TW + 1), C)
            for b in range(2)
        ]
        for a in range(2)
    ]

    def d(k, l):
        base = (k // 2) * (TW + 1) + (l // 2)
        return jax.lax.slice(
            phases[k % 2][l % 2], (base, 0), (base + M, C)
        )

    y = [
        [jnp.zeros((M, co), jnp.float32) for _ in range(2)]
        for _ in range(2)
    ]

    # j-transform coefficients: column j of V needs W_kj = BT[j,:] . d[k,:]
    #   W_k0 = d_k0 - d_k2 ; W_k1 = d_k1 + d_k2
    #   W_k2 = d_k2 - d_k1 ; W_k3 = d_k1 - d_k3
    for j in range(4):
        if j == 0:
            w = [d(k, 0) - d(k, 2) for k in range(4)]
        elif j == 1:
            w = [d(k, 1) + d(k, 2) for k in range(4)]
        elif j == 2:
            w = [d(k, 2) - d(k, 1) for k in range(4)]
        else:
            w = [d(k, 1) - d(k, 3) for k in range(4)]
        # i-transform: V_ij = BT[i,:] . W[:,j], same butterflies
        for i in range(4):
            if i == 0:
                v = w[0] - w[2]
            elif i == 1:
                v = w[1] + w[2]
            elif i == 2:
                v = w[2] - w[1]
            else:
                v = w[1] - w[3]
            m_ij = jax.lax.dot_general(
                v, u_ref[i * 4 + j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # fold A^T M A into the 4 output accumulators as this term
            # retires: coeff(a, b) = AT[a, i] * AT[b, j] in {0, +/-1}
            for a in range(2):
                ca = _AT[a, i]
                if ca == 0.0:
                    continue
                for b in range(2):
                    cb = _AT[b, j]
                    coeff = ca * cb
                    if coeff == 0.0:
                        continue
                    y[a][b] = y[a][b] + m_ij if coeff > 0 else y[a][b] - m_ij

    # store: tile (ti, tj) outputs land at rows 2ti+a, cols 2tj+b.
    # columns interleave via a [M, 2, co] stack; rows via a [TH, 2, ...] one.
    rows = []
    for a in range(2):
        r = jnp.stack([y[a][0] + bias, y[a][1] + bias], axis=1)
        rows.append(r.reshape(TH, (TW + 1) * 2, co))
    out = jnp.stack(rows, axis=1).reshape(2 * TH, 2 * (TW + 1), co)
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_co(H: int, W: int, C: int, Co: int, itemsize: int = 2):
    """co chunk, or None when nothing fits the VMEM budget.

    Live VMEM per grid cell: 4 phase planes (the whole image), the U
    chunk (double-buffered), 4 f32 accumulators + the output block, and
    the transform temporaries (4 W planes + V + the retiring M_ij)."""
    th, tw = H // 2, W // 2
    m = th * (tw + 1)
    planes = (H + 4) * (W + 2) * C * itemsize
    temps = 5 * m * C * itemsize + m * 128 * 4  # 4 W + V (+ minimal M_ij)

    def fits(co):
        u = 16 * C * co * itemsize
        accs = 4 * m * co * 4
        outb = 2 * th * 2 * (tw + 1) * co * itemsize
        mij = m * co * 4
        return planes + 2 * u + accs + outb + temps + mij <= 12 * 1024 * 1024

    candidates = [Co] + [
        c for c in (640, 512, 384, 256, 128)
        if c < Co and Co % c == 0 and c % 128 == 0
    ]
    for co in candidates:
        if fits(co):
            return co
    return None


def wino3x3_supported(
    x_shape, k_shape, stride: int, padding, itemsize: int = 2
) -> bool:
    """Dispatch guard: stride-1 3x3 'same' convs on even planes whose
    working set fits VMEM."""
    if stride != 1 or padding not in (None, 1):
        return False
    if len(k_shape) != 4 or k_shape[0] != 3 or k_shape[1] != 3:
        return False
    b, h, w, c = x_shape
    if h % 2 or w % 2 or h < 8 or w < 8:
        return False
    return _pick_co(h, w, c, k_shape[3], itemsize) is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wino3x3_fwd(x, kernel, bias, *, interpret=False):
    B, H, W, C = x.shape
    Co = kernel.shape[3]
    co = _pick_co(H, W, C, Co, jnp.dtype(x.dtype).itemsize)
    if co is None:
        return _xla_conv(x, kernel, bias)
    th, tw = H // 2, W // 2

    u = winograd_weights(kernel).astype(x.dtype)  # [16, C, Co]
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 1), (0, 0)))
    # de-interleave into [B, 2, 2, th+2, tw+1, C] phase planes (HBM-side)
    ph = xp.reshape(B, th + 2, 2, tw + 1, 2, C).transpose(0, 2, 4, 1, 3, 5)

    out = pl.pallas_call(
        functools.partial(_wino_kernel, TH=th, TW=tw, C=C, co=co),
        grid=(B, Co // co),
        in_specs=[
            pl.BlockSpec(
                (1, 2, 2, th + 2, tw + 1, C), lambda b, j: (b, 0, 0, 0, 0, 0)
            ),
            pl.BlockSpec((16, C, co), lambda b, j: (0, 0, j)),
            pl.BlockSpec((1, co), lambda b, j: (0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * th, 2 * (tw + 1), co), lambda b, j: (b, 0, 0, j)
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * th, 2 * (tw + 1), Co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(ph, u, bias.astype(jnp.float32).reshape(1, -1))
    # crop the junk tile column (output columns W and W+1)
    return out[:, :, :W, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def wino3x3(x, kernel, bias, interpret=False):
    """3x3 stride-1 'same' conv via Winograd F(2x2,3x3), NHWC x HWIO."""
    return _wino3x3_fwd(x, kernel, bias, interpret=interpret)


def _xla_conv(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(x.dtype)


def _fwd(x, kernel, bias, interpret):
    return wino3x3(x, kernel, bias, interpret), (x, kernel, bias)


def _bwd(interpret, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(_xla_conv, x, kernel, bias)
    return vjp(g)


wino3x3.defvjp(_fwd, _bwd)
