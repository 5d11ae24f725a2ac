"""GroupNorm kernel variants vs the bandwidth floor at UNet shapes (B8).

perf_gn3.py showed the shipped one-pass per-sample-grid kernel at 3-5x
the 1R+1W floor (and losing to isolated XLA): the n-step grid moves one
whole sample per program and doesn't pipeline. This A/Bs the chunked
two-kernel formulation (stats grid over HW chunks + apply pass, 2R+1W
for bf16) at several chunk sizes against the shipped kernel and XLA.
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
from complex_prompt_diffusion_tpu.ops.groupnorm import (
    _gn_apply_kernel,
    _gn_kernel,
    _gn_stats_kernel,
    _gn_xla,
    group_norm_silu,
)

BW = 819e9
REPS = 30
ITERS = 20


def chunked(x, gamma, beta, ch, num_groups=32, eps=1e-5, silu=True):
    n, h, w, c = x.shape
    hw = h * w
    nk = hw // ch
    xr = x.reshape(n, hw, c)
    c2g = np.zeros((c, num_groups), dtype=np.float32)
    gs = c // num_groups
    for g in range(num_groups):
        c2g[g * gs : (g + 1) * gs, g] = 1.0
    c2g = jnp.asarray(c2g)
    stats = pl.pallas_call(
        functools.partial(
            _gn_stats_kernel, eps=eps, n_per_group=float(hw * gs), nk=nk
        ),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        grid=(n, nk),
        in_specs=[
            pl.BlockSpec((1, ch, c), lambda i, k: (i, k, 0)),
            pl.BlockSpec((c, num_groups), lambda i, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, k: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xr, c2g)
    out = pl.pallas_call(
        functools.partial(_gn_apply_kernel, silu=silu),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n, nk),
        in_specs=[
            pl.BlockSpec((1, ch, c), lambda i, k: (i, k, 0)),
            pl.BlockSpec((1, 2, c), lambda i, k: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, k: (0, 0)),
            pl.BlockSpec((1, c), lambda i, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ch, c), lambda i, k: (i, k, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xr, stats, gamma.reshape(1, c), beta.reshape(1, c))
    return out.reshape(n, h, w, c)


def flat_onepass(x, gamma, beta, ch, num_groups=32, eps=1e-5, silu=True):
    """One-pass kernel but with a (n*nk,) flattened grid: same math as the
    shipped kernel when nk==1; finer blocks otherwise are NOT valid (stats
    need the whole sample) — only used with ch == hw to isolate the cost of
    the 3D blockspec vs flat."""
    n, h, w, c = x.shape
    hw = h * w
    assert ch == hw
    xr = x.reshape(n, hw, c)
    c2g = np.zeros((c, num_groups), dtype=np.float32)
    gs = c // num_groups
    for g in range(num_groups):
        c2g[g * gs : (g + 1) * gs, g] = 1.0
    c2g = jnp.asarray(c2g)
    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, eps=eps, n_per_group=float(hw * gs), silu=silu,
            one_pass=True,
        ),
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
            return jax.lax.fori_loop(0, REPS, lambda j, a: step(a) * 1.001, acc)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return jax.jit(run)


def case(b, h, w, c):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    hw = h * w
    floor = 2 * b * hw * c * 2 / BW
    rows = [("ship", loop(lambda a: group_norm_silu(a, gamma, beta, 32, use_pallas=True)))]
    for ch in [hw, 2048, 1024, 512, 256]:
        if ch <= hw and hw % ch == 0:
            rows.append((f"chunk{ch}", loop(
                functools.partial(lambda a, _ch: chunked(a, gamma, beta, _ch), _ch=ch))))
    rows.append(("xla", loop(lambda a: _gn_xla(a, gamma, beta, 32, 1e-5, True))))
    parts = []
    for name, fn in rows:
        dt = timeit(fn, x)
        parts.append(f"{name} {dt*1e6:6.1f}")
    print(f"B{b} {h}x{w}x{c} (floor {floor*1e6:5.1f}us): " + " | ".join(parts), flush=True)


B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = 20 * max(1, 8 // B)
for (h, c) in [(64, 320), (64, 640), (32, 640), (32, 1280), (16, 1280), (16, 2560), (8, 1280)]:
    case(B, h, h, c)
