"""Copy-kernel buffer_count sweep: can multi-buffering lift the ~350 GB/s
Pallas streaming rate toward the 819 GB/s HBM peak?"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

REPS = 30
ITERS = 20
BW = 819e9


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def make(shape, ch, nbuf):
    n, hw, c = shape
    nk = hw // ch
    mode = pl.Buffered(buffer_count=nbuf) if nbuf else None

    def fn(x):
        return pl.pallas_call(
            _copy_kernel,
            out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
            grid=(n, nk),
            in_specs=[pl.BlockSpec((1, ch, c), lambda i, k: (i, k, 0),
                                   pipeline_mode=mode)],
            out_specs=pl.BlockSpec((1, ch, c), lambda i, k: (i, k, 0),
                                   pipeline_mode=mode),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x)

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


def case(b, hw, c):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, c), jnp.bfloat16)
    floor = 2 * b * hw * c * 2 / BW
    parts = []
    for ch in [2048, 1024, 512]:
        if ch > hw or hw % ch:
            continue
        for nbuf in [0, 3, 4, 8]:
            try:
                f = make((b, hw, c), ch, nbuf)
                dt = timeit(loop(functools.partial(lambda a, _f: _f(a), _f=f)), x)
                parts.append(f"c{ch}b{nbuf} {dt*1e6:6.1f}")
            except Exception as e:
                parts.append(f"c{ch}b{nbuf} ERR:{type(e).__name__}")
    print(f"B{b} {hw}x{c} (floor {floor*1e6:5.1f}us): " + " | ".join(parts), flush=True)


B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
for (hw, c) in [(4096, 320), (4096, 640), (1024, 1280)]:
    case(B, hw, c)
