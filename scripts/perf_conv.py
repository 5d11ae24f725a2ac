"""Conv-path micro-benchmarks at SD-1.5 shapes: XLA 3x3 conv vs matmul
roofline, NHWC bf16, B=2 (one CFG call at batch 1)."""
import time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

PEAK = 197e12  # bf16 TFLOP/s, v5e
REPS = 30      # chained ops per loop iteration (beats the 0.7ms loop floor)
ITERS = 10

def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out.mean()))
    args = tuple(a * 1.0001 for a in args)
    t0 = time.perf_counter()
    float(jnp.float32(fn(*args).mean()))
    return (time.perf_counter() - t0) / (ITERS * REPS)

def conv_case(b, h, w, cin, cout, k):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.bfloat16)
    wgt = jax.random.normal(jax.random.PRNGKey(1), (k, k, cin, cout), jnp.bfloat16) * 0.02
    @jax.jit
    def run(x, wgt):
        def body(i, acc):
            def step(j, a):
                return jax.lax.conv_general_dilated(
                    a, wgt, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16) * 0.01
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, x)
    dt = timeit(run, x, wgt)
    fl = 2 * b * h * w * k * k * cin * cout
    print(f"conv {k}x{k} {h}x{w}x{cin}->{cout} B{b}: {dt*1e3:7.3f} ms  "
          f"{fl/dt/1e12:6.1f} TF/s  {fl/dt/PEAK*100:5.1f}% SOL")

def mm_case(m, kk, n):
    a = jax.random.normal(jax.random.PRNGKey(0), (m, kk), jnp.bfloat16)
    bmat = jax.random.normal(jax.random.PRNGKey(1), (kk, n), jnp.bfloat16) * 0.02
    @jax.jit
    def run(a, bmat):
        def body(i, acc):
            def step(j, z):
                return (z @ bmat) * 0.01 + z * 0.5
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, a)
    dt = timeit(run, a, bmat)
    fl = 2 * m * kk * n
    print(f"mm {m}x{kk}x{n}: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s  {fl/dt/PEAK*100:5.1f}% SOL")

B = 2
conv_case(B, 64, 64, 320, 320, 3)
conv_case(B, 32, 32, 640, 640, 3)
conv_case(B, 16, 16, 1280, 1280, 3)
conv_case(B, 8, 8, 1280, 1280, 3)
conv_case(B, 64, 64, 320, 320, 1)
conv_case(B, 16, 16, 2560, 2560, 3)  # output-block concat-width conv
print("-- matmul equivalents (same M,K,N as im2col) --")
# square matmuls (K=N) at im2col-like M,K — TF/s rate is the comparable metric
mm_case(B * 64 * 64, 2880, 2880)
mm_case(B * 32 * 32, 5760, 5760)
mm_case(B * 16 * 16, 11520, 11520)
mm_case(B * 64 * 64, 320, 320)
