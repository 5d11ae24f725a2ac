"""Pure-copy streaming-rate sweep: where does Pallas lose 2.5x DMA rate?

Rows (all B8, bf16):
  xla      — x*1.0001 (one fused elementwise pass, XLA's streaming rate)
  p<ch>    — pallas copy, grid (n, hw/ch), block [1, ch, c], bf16 passthrough
  f<ch>    — same but astype(f32)->astype(bf16) inside (the GN convert)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

BW = 819e9
REPS = 30
ITERS = 20


def _copy_kernel(x_ref, o_ref, *, conv):
    x = x_ref[...]
    if conv:
        x = x.astype(jnp.float32).astype(jnp.bfloat16)
    o_ref[...] = x


def make(shape, ch, conv):
    n, hw, c = shape
    nk = hw // ch

    def fn(x):
        return pl.pallas_call(
            functools.partial(_copy_kernel, conv=conv),
            out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
            grid=(n, nk),
            in_specs=[pl.BlockSpec((1, ch, c), lambda i, k: (i, k, 0))],
            out_specs=pl.BlockSpec((1, ch, c), lambda i, k: (i, k, 0)),
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
    dt = timeit(loop(lambda a: a * 1.0001), x)
    parts.append(f"xla {dt*1e6:6.1f}")
    for ch in [hw, 2048, 1024, 512, 256]:
        if ch <= hw and hw % ch == 0:
            for conv, tag in ((False, "p"), (True, "f")):
                f = make((b, hw, c), ch, conv)
                dt = timeit(loop(functools.partial(lambda a, _f: _f(a), _f=f)), x)
                parts.append(f"{tag}{ch} {dt*1e6:6.1f}")
    print(f"B{b} {hw}x{c} (floor {floor*1e6:5.1f}us): " + " | ".join(parts), flush=True)


B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
for (hw, c) in [(4096, 320), (4096, 640), (1024, 1280)]:
    case(B, hw, c)
