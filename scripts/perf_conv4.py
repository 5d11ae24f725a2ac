"""Sum-of-9-shifted-dot_generals conv3x3 vs XLA conv at the 64^2 UNet level.

The 64x64x320 conv line is the only one measurably below the chip's
square-matmul ceiling (55.8% SOL vs ~67%, scripts/perf_conv.py). Hypothesis:
XLA's native conv lowering pays halo handling there; an explicit tap-sum of
nine [B,H,W,C]x[C,Co] dot_generals (no im2col materialization — each tap is
a static slice of one padded copy) may tile like the plain matmuls that
reach the ceiling. Also measures the f32-accumulate variant (the model path
uses preferred_element_type f32).
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

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


def tap_sum_conv(x, wgt, out_dtype):
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dh in range(3):
        for dw in range(3):
            xs = jax.lax.slice(
                xp, (0, dh, dw, 0), (b, dh + h, dw + w, c)
            )
            t = jax.lax.dot_general(
                xs,
                wgt[dh, dw],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    return acc.astype(out_dtype)


def case(b, h, w, cin, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.bfloat16)
    wgt = (
        jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16)
        * 0.02
    )
    fl = 2 * b * h * w * 9 * cin * cout

    def loop(step):
        @jax.jit
        def run(x, wgt):
            def body(i, acc):
                def inner(j, a):
                    y = step(a, wgt)
                    return y * 0.01
                return jax.lax.fori_loop(0, REPS, inner, acc)
            return jax.lax.fori_loop(0, ITERS, body, x)
        return run

    run_taps = loop(lambda a, wg: tap_sum_conv(a, wg, a.dtype))
    run_xla = loop(
        lambda a, wg: jax.lax.conv_general_dilated(
            a, wg, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(a.dtype)
    )

    dt_t = timeit(run_taps, x, wgt)
    dt_x = timeit(run_xla, x, wgt)
    print(
        f"{h}x{w}x{cin}->{cout} B{b}: taps {dt_t*1e3:6.3f} ms "
        f"{fl/dt_t/PEAK*100:5.1f}% | xla(f32acc) {dt_x*1e3:6.3f} ms "
        f"{fl/dt_x/PEAK*100:5.1f}% | speedup {dt_x/dt_t:5.2f}x",
        flush=True,
    )


B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = 10 * max(1, 8 // B)
if len(sys.argv) > 2 and sys.argv[2] == "8x8":
    case(B, 8, 8, 1280, 1280)
elif len(sys.argv) > 2 and sys.argv[2] == "big":
    # the planes the ">= 4096" auto-gate ALSO admitted without measurement:
    # VAE decoder resolutions (512 latents decode through 128..512 planes)
    # and the 128^2 level-0 planes of untiled 1024^2 renders
    ITERS = 2
    case(B, 128, 128, 320, 320)
    case(B, 128, 128, 512, 512)
    case(B, 256, 256, 256, 256)
    case(B, 512, 512, 128, 128)
else:
    case(B, 64, 64, 320, 320)
    case(B, 32, 32, 640, 640)
    case(B, 16, 16, 1280, 1280)
    case(B, 8, 8, 1280, 1280)
