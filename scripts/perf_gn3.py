"""GroupNorm+SiLU per-site floor accounting at the SD-1.5 UNet shapes.

The round-3 budget puts GN at 6.75 ms/step across ~60 sites; the 2-pass
HBM traffic floor (1R+1W for the in-VMEM one-pass kernel at 819 GB/s)
sums to ~1.5-2 ms. This measures each site shape in isolation (whole
jitted fori_loop, min-of-3) against that floor, and A/Bs a merged-stats
variant (one [2,C]x[C,G] matmul instead of four M=1 matmuls per site).
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu.ops.groupnorm import group_norm_silu, _gn_xla

BW = 819e9
REPS = 30
ITERS = 20


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


def case(b, h, w, c):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)

    def loop(step):
        def run(x):
            def body(i, acc):
                return jax.lax.fori_loop(
                    0, REPS, lambda j, a: step(a) * 1.001, acc
                )
            return jax.lax.fori_loop(0, ITERS, body, x)
        return jax.jit(run)

    run_p = loop(lambda a: group_norm_silu(a, gamma, beta, 32, use_pallas=True))
    run_x = loop(lambda a: _gn_xla(a, gamma, beta, 32, 1e-5, True))

    dt_p = timeit(run_p, x)
    dt_x = timeit(run_x, x)
    floor = 2 * b * h * w * c * 2 / BW
    print(
        f"B{b} {h}x{w}x{c}: pallas {dt_p*1e6:7.1f} us | xla {dt_x*1e6:7.1f} us"
        f" | 1R+1W floor {floor*1e6:6.1f} us | pallas/floor {dt_p/floor:5.2f}x",
        flush=True,
    )


B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = 20 * max(1, 8 // B)
for (h, c) in [(64, 320), (64, 640), (32, 640), (32, 1280), (16, 1280), (16, 2560), (8, 1280)]:
    case(B, h, h, c)
