"""Fused vs separate qkv projection at SD level-0 shapes."""
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

def case(b, s, c):
    x = jax.random.normal(jax.random.PRNGKey(0), (b * s, c), jnp.bfloat16)
    wq = jax.random.normal(jax.random.PRNGKey(1), (c, c), jnp.bfloat16) * 0.02
    wk = jax.random.normal(jax.random.PRNGKey(2), (c, c), jnp.bfloat16) * 0.02
    wv = jax.random.normal(jax.random.PRNGKey(3), (c, c), jnp.bfloat16) * 0.02

    @jax.jit
    def sep(x, wq, wk, wv):
        def body(i, acc):
            def step(j, a):
                q = a @ wq; k = a @ wk; v = a @ wv
                return a * 0.5 + (q + k + v) * 0.01
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, x)

    @jax.jit
    def fused(x, wq, wk, wv):
        w = jnp.concatenate([wq, wk, wv], axis=1)
        def body(i, acc):
            def step(j, a):
                qkv = a @ w
                q, k, v = jnp.split(qkv, 3, axis=-1)
                return a * 0.5 + (q + k + v) * 0.01
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, x)

    fl = 3 * 2 * b * s * c * c
    for tag, fn in (("sep", sep), ("fused", fused)):
        dt = timeit(fn, x, wq, wk, wv)
        print(f"qkv {tag} B{b} S{s} C{c}: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s  {fl/dt/PEAK*100:5.1f}% SOL")

case(8, 4096, 320)
case(8, 1024, 640)
case(8, 256, 1280)
