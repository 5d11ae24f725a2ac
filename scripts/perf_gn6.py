"""In-kernel ablation of the one-pass GroupNorm at the worst shape.

Variants (same grid/blockspecs, pieces removed):
  copy    — x -> astype f32 -> astype bf16 -> out (DMA + convert only)
  stats   — copy + s1/s2 reduction + group matmuls (writes x unchanged)
  norm    — stats + (x-mean)*rstd*gamma+beta, NO sigmoid
  full    — shipped math (merged-matmul form)
  bf16sig — full but sigmoid computed in bf16 (cast y once)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

BW = 819e9
REPS = 30
ITERS = 20


def _kernel(x_ref, gamma_ref, beta_ref, c2g_ref, o_ref, *, eps, n_per_group,
            mode):
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    if mode == "copy":
        o_ref[0] = x.astype(o_ref.dtype)
        return
    c2g = c2g_ref[...]
    s12 = jnp.concatenate(
        [jnp.sum(x, axis=0, keepdims=True),
         jnp.sum(x * x, axis=0, keepdims=True)], axis=0)
    g12 = jnp.dot(s12, c2g, preferred_element_type=jnp.float32) / n_per_group
    mean_g = g12[0:1]
    var_g = jnp.maximum(g12[1:2] - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mr = jnp.concatenate([mean_g, rstd_g], axis=0)
    mr_c = jnp.dot(mr, c2g.T, preferred_element_type=jnp.float32)
    if mode == "stats":
        # keep stats live without a full normalize pass
        o_ref[0] = (x + mr_c[1:2] * 0.0).astype(o_ref.dtype)
        return
    y = (x - mr_c[0:1]) * mr_c[1:2]
    y = y * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(jnp.float32)
    if mode == "norm":
        o_ref[0] = y.astype(o_ref.dtype)
        return
    if mode == "bf16sig":
        yb = y.astype(jnp.bfloat16)
        one = jnp.full_like(yb, 1.0)
        sig = one / (one + jnp.exp(-yb))
        o_ref[0] = (yb * sig).astype(o_ref.dtype)
        return
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def make(mode, shape, num_groups=32, eps=1e-5):
    n, h, w, c = shape
    hw = h * w
    c2g = np.zeros((c, num_groups), dtype=np.float32)
    gs = c // num_groups
    for g in range(num_groups):
        c2g[g * gs : (g + 1) * gs, g] = 1.0
    c2g = jnp.asarray(c2g)

    def fn(x, gamma, beta):
        xr = x.reshape(n, hw, c)
        out = pl.pallas_call(
            functools.partial(_kernel, eps=eps, n_per_group=float(hw * gs),
                              mode=mode),
            out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((c, num_groups), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(xr, gamma.reshape(1, c), beta.reshape(1, c), c2g)
        return out.reshape(n, h, w, c)

    return fn


def timeit(fn, x):
    out = fn(x)
    float(jnp.float32(out.mean()))
    best = float("inf")
    for r in range(3):
        x2 = x * (1.0 + 1e-4 * (r + 1))
        t0 = time.perf_counter()
        float(jnp.float32(fn(x2).mean()))
        best = min(best, time.perf_counter() - t0)
    return best / (ITERS * REPS)


def loop(step):
    def run(x):
        def body(i, acc):
            return jax.lax.fori_loop(0, REPS, lambda j, a: step(a), acc)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return jax.jit(run)


def case(b, h, w, c):
    shape = (b, h, w, c)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    floor = 2 * b * h * w * c * 2 / BW
    parts = []
    for mode in ("copy", "stats", "norm", "full", "bf16sig"):
        f = make(mode, shape)
        dt = timeit(loop(functools.partial(
            lambda a, _f: _f(a, gamma, beta), _f=f)), x)
        parts.append(f"{mode} {dt*1e6:6.1f}")
    print(f"B{b} {h}x{w}x{c} (floor {floor*1e6:5.1f}us): " + " | ".join(parts), flush=True)


B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
for (h, c) in [(64, 320), (64, 640), (32, 1280)]:
    case(B, h, h, c)
