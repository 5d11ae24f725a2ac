"""Device-true timing: in-jit loop, DIFFERENT input for the timed call
(the axon tunnel memoizes identical RPCs)."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu.ops.attention import flash_attention, _xla_attention

ITERS = 50

def timed(fn, q, k, v):
    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            return fn(acc, k, v).astype(q.dtype) * 0.999 + q * 0.001
        return jax.lax.fori_loop(0, ITERS, body, q)
    loop(q, k, v).block_until_ready()          # compile
    q2 = q * 1.0001
    t0 = time.perf_counter()
    loop(q2, k, v).block_until_ready()         # fresh input -> no RPC memoization
    return (time.perf_counter() - t0) / ITERS * 1e3

SHAPES = [
    (2, 8, 4096, 4096, 40),
    (2, 8, 1024, 1024, 80),
    (2, 8, 256, 256, 160),
    (2, 8, 4096, 77, 40),
]
for shape in SHAPES:
    b, h, sq, skv, d = shape
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, skv, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, skv, d), jnp.bfloat16)
    scale = 1.0 / (d ** 0.5)
    res = {"xla": timed(functools.partial(_xla_attention, scale=scale), q, k, v)}
    for bq, bk in ([(256, 512), (512, 1024), (1024, 2048)] if sq == skv else [(256, 512)]):
        if bq <= sq:
            res[f"pl{bq}x{bk}"] = timed(functools.partial(flash_attention, use_pallas=True, block_q=bq, block_k=bk), q, k, v)
    flop = 2 * 2 * b * h * sq * skv * d
    best = min(res.values())
    print(shape, {k2: round(v2, 4) for k2, v2 in res.items()}, f"best={flop/(best/1e3)/1e12:.1f} TFLOP/s")
