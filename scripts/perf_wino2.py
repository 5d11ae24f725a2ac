"""Fused Pallas Winograd F(2x2,3x3) (ops/probes/winograd.py) vs XLA direct conv
vs the shifted-matmul Pallas conv (ops/conv.py) at the SD-1.5 level shapes
the Winograd VMEM budget admits. NHWC bf16; whole-fori-loop A/B, min-of-3.

The weight transform U = G g G^T is computed once inside the jit but
outside the timing loops (in the model it is scan-invariant and XLA's
while-LICM hoists it)."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu.ops.conv import conv3x3, conv3x3_supported
from complex_prompt_diffusion_tpu.ops.probes.winograd import (
    wino3x3,
    wino3x3_supported,
)

PEAK = 197e12
REPS = 30
ITERS = 10


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out.mean()))
    best = float("inf")
    for r in range(3):
        a2 = tuple(a * (1.0 + 1e-4 * (r + 1)) for a in args)
        t0 = time.perf_counter()
        float(jnp.float32(fn(*a2).mean()))
        best = min(best, time.perf_counter() - t0)
    return best / (ITERS * REPS)


def case(b, h, w, cin, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.bfloat16)
    wgt = (
        jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16)
        * 0.02
    )
    bias = jnp.zeros((cout,), jnp.float32)
    fl = 2 * b * h * w * 9 * cin * cout

    def loop(step):
        def run(x, wgt):
            def body(i, acc):
                return jax.lax.fori_loop(
                    0, REPS, lambda j, a: step(a, wgt) * 0.01, acc
                )
            return jax.lax.fori_loop(0, ITERS, body, x)
        return jax.jit(run)

    run_w = loop(lambda a, k: wino3x3(a, k, bias))
    run_x = loop(
        lambda a, k: jax.lax.conv_general_dilated(
            a, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        + bias.astype(jnp.bfloat16)
    )

    dt_w = timeit(run_w, x, wgt)
    dt_x = timeit(run_x, x, wgt)
    line = (
        f"{h}x{w}x{cin}->{cout} B{b}: wino {dt_w*1e3:6.3f} ms "
        f"({fl/2.25/dt_w/PEAK*100:4.1f}% on wino-flops) | "
        f"xla {dt_x*1e3:6.3f} ms ({fl/dt_x/PEAK*100:4.1f}% SOL) | "
        f"wino/xla {dt_x/dt_w:5.2f}x"
    )
    if conv3x3_supported(x.shape, wgt.shape, 1, 1):
        dt_s = timeit(loop(lambda a, k: conv3x3(a, k, bias)), x, wgt)
        line += f" | shifted {dt_s*1e3:6.3f} ms (wino/shifted {dt_s/dt_w:4.2f}x)"
    print(line, flush=True)


B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = 10 * max(1, 8 // B)
for (h, w, cin, cout) in [
    (32, 32, 640, 640),
    (16, 16, 1280, 1280),
    (8, 8, 1280, 1280),
    (64, 64, 320, 320),
]:
    if wino3x3_supported((B, h, w, cin), (3, 3, cin, cout), 1, 1):
        case(B, h, w, cin, cout)
    else:
        print(f"{h}x{w}x{cin}->{cout} B{B}: wino unsupported (VMEM)", flush=True)
