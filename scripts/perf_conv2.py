"""Conv alternatives: XLA conv vs im2col+matmul at SD shapes, B=8 (batch-4 CFG)."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
PEAK = 197e12
REPS, ITERS = 30, 10

def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out.mean()))
    args = tuple(a * 1.0001 for a in args)
    t0 = time.perf_counter()
    float(jnp.float32(fn(*args).mean()))
    return (time.perf_counter() - t0) / (ITERS * REPS)

def report(tag, dt, fl):
    print(f"{tag}: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s  {fl/dt/PEAK*100:5.1f}% SOL")

def xla_conv(b, h, w, cin, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.bfloat16)
    wgt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16) * 0.02
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
    report(f"xla conv {h}x{w}x{cin}->{cout} B{b}", timeit(run, x, wgt),
           2 * b * h * w * 9 * cin * cout)

def im2col_conv(b, h, w, cin, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.bfloat16)
    wgt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16) * 0.02
    @jax.jit
    def run(x, wgt):
        wm = wgt.reshape(9 * cin, cout)
        def body(i, acc):
            def step(j, a):
                p = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
                cols = [p[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)]
                patches = jnp.concatenate(cols, axis=-1)  # (b,h,w,9cin)
                y = patches.reshape(b * h * w, 9 * cin) @ wm
                return y.reshape(b, h, w, cout) * 0.01
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, x)
    report(f"im2col+mm {h}x{w}x{cin}->{cout} B{b}", timeit(run, x, wgt),
           2 * b * h * w * 9 * cin * cout)

for B in (8,):
    xla_conv(B, 64, 64, 320, 320)
    xla_conv(B, 32, 32, 640, 640)
    xla_conv(B, 16, 16, 1280, 1280)
    im2col_conv(B, 64, 64, 320, 320)
    im2col_conv(B, 32, 32, 640, 640)
    im2col_conv(B, 16, 16, 1280, 1280)
