"""Measure transformer-FF (GEGLU) and qkv-projection efficiency at the
three SD-1.5 attention levels, B8 (bench batch). Forced materialization;
ITERS loop to amortize dispatch."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

B = 8
ITERS = 20
LEVELS = [(4096, 320), (1024, 640), (256, 1280)]

def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out).mean())
    args = tuple(a * 1.0001 if a.ndim == 3 else a for a in args)
    t0 = time.perf_counter()
    float(jnp.float32(fn(*args)).mean())
    return (time.perf_counter() - t0) / ITERS * 1e3

for s, c in LEVELS:
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, s, c), jnp.bfloat16)
    w1 = jax.random.normal(k, (c, 8 * c), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((8 * c,), jnp.bfloat16)
    w2 = jax.random.normal(k, (4 * c, c), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((c,), jnp.bfloat16)

    @jax.jit
    def ff(x, w1, b1, w2, b2):
        def body(i, acc):
            y = jnp.dot(acc, w1) + b1
            v, g = jnp.split(y, 2, axis=-1)
            y = v * jax.nn.gelu(g, approximate=False)
            return jnp.dot(y, w2) + b2
        return jax.lax.fori_loop(0, ITERS, body, x)

    ms = timeit(ff, x, w1, b1, w2, b2)
    flops = 2 * B * s * c * 8 * c + 2 * B * s * 4 * c * c
    print(f"ff    S={s:5d} C={c:5d}: {ms:6.3f} ms  {flops/ms/1e9:6.1f} TF/s ({flops/ms/1e9/197*100:4.1f}% peak)")

    wq = jax.random.normal(k, (c, c), jnp.bfloat16) * 0.02
    wk = jax.random.normal(k, (c, c), jnp.bfloat16) * 0.02
    wv = jax.random.normal(k, (c, c), jnp.bfloat16) * 0.02

    @jax.jit
    def qkv_sep(x, wq, wk, wv):
        def body(i, acc):
            q = jnp.dot(acc, wq); kk = jnp.dot(acc, wk); v = jnp.dot(acc, wv)
            return q + kk * 0.5 + v * 0.25
        return jax.lax.fori_loop(0, ITERS, body, x)

    @jax.jit
    def qkv_fused(x, wq, wk, wv):
        w = jnp.concatenate([wq, wk, wv], axis=1)
        def body(i, acc):
            qkv = jnp.dot(acc, w)
            q, kk, v = jnp.split(qkv, 3, axis=-1)
            return q + kk * 0.5 + v * 0.25
        return jax.lax.fori_loop(0, ITERS, body, x)

    f2 = 3 * 2 * B * s * c * c
    ms = timeit(qkv_sep, x, wq, wk, wv)
    print(f"qkv_s S={s:5d} C={c:5d}: {ms:6.3f} ms  {f2/ms/1e9:6.1f} TF/s ({f2/ms/1e9/197*100:4.1f}%)")
    ms = timeit(qkv_fused, x, wq, wk, wv)
    print(f"qkv_f S={s:5d} C={c:5d}: {ms:6.3f} ms  {f2/ms/1e9:6.1f} TF/s ({f2/ms/1e9/197*100:4.1f}%)")
