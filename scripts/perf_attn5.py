"""Attention timing with forced materialization + fresh inputs."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu.ops.attention import flash_attention, _xla_attention

ITERS = 30

def timed(fn, q, k, v):
    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            return (fn(acc, k, v).astype(q.dtype) * 0.5 + q * 0.5)
        return jax.lax.fori_loop(0, ITERS, body, q)
    float(jnp.float32(loop(q, k, v).mean()))  # compile + run
    q2 = q * 1.0001
    t0 = time.perf_counter()
    float(jnp.float32(loop(q2, k, v).mean()))
    return (time.perf_counter() - t0) / ITERS * 1e3

shape = (2, 8, 4096, 4096, 40)
b, h, sq, skv, d = shape
ks = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
scale = 1.0 / (d ** 0.5)
flop = 2 * 2 * b * h * sq * skv * d
res = {}
res["xla"] = timed(functools.partial(_xla_attention, scale=scale), q, k, v)
for bq, bk in [(256, 512), (512, 512), (512, 1024), (1024, 1024), (512, 2048), (1024, 2048), (2048, 1024)]:
    try:
        res[f"pl{bq}x{bk}"] = timed(functools.partial(flash_attention, use_pallas=True, block_q=bq, block_k=bk), q, k, v)
    except Exception as e:
        res[f"pl{bq}x{bk}"] = str(type(e).__name__)
for name, t in res.items():
    if isinstance(t, float):
        print(f"{name:14s} {t:8.3f} ms  {flop/(t/1e3)/1e12:6.1f} TF/s")
    else:
        print(name, t)
