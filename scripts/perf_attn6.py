"""Accurate per-shape pallas-vs-XLA comparison to set the dispatch heuristic."""
import time, functools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu.ops.attention import flash_attention, _xla_attention

ITERS = 40

def timed(fn, q, k, v):
    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            return (fn(acc, k, v).astype(q.dtype) * 0.5 + q * 0.5)
        return jax.lax.fori_loop(0, ITERS, body, q)
    float(jnp.float32(loop(q, k, v).mean()))
    q2 = q * 1.0001
    t0 = time.perf_counter()
    float(jnp.float32(loop(q2, k, v).mean()))
    return (time.perf_counter() - t0) / ITERS * 1e3

SHAPES = [
    (2, 8, 4096, 77, 40),
    (2, 8, 1024, 77, 80),
    (2, 8, 256, 77, 160),
    (2, 8, 64, 77, 160),
    (2, 8, 1024, 1024, 80),
    (2, 8, 256, 256, 160),
    (2, 8, 64, 64, 160),
]
for shape in SHAPES:
    b, h, sq, skv, d = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
    t_x = timed(functools.partial(_xla_attention, scale=d**-0.5), q, k, v)
    t_p = timed(functools.partial(flash_attention, use_pallas=True), q, k, v)
    print(shape, f"xla {t_x:.3f}ms  pallas {t_p:.3f}ms  -> {'pallas' if t_p < t_x else 'XLA'}")
