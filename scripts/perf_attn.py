"""Micro-bench: pallas flash attention vs XLA attention at SD1.5 shapes."""
import time, functools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu.ops.attention import flash_attention, _xla_attention

SHAPES = [  # (B, H, Sq, Skv, D) — SD1.5 at 512x512, CFG batch 2
    (2, 8, 4096, 4096, 40),
    (2, 8, 1024, 1024, 80),
    (2, 8, 256, 256, 160),
    (2, 8, 64, 64, 160),
    (2, 8, 4096, 77, 40),
    (2, 8, 1024, 77, 80),
    (2, 8, 256, 77, 160),
    (2, 8, 64, 77, 160),
]

def bench(fn, *args, iters=20):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3

for shape in SHAPES:
    b, h, sq, skv, d = shape
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, skv, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, skv, d), jnp.bfloat16)
    scale = 1.0 / (d ** 0.5)
    xla = jax.jit(functools.partial(_xla_attention, scale=scale))
    t_xla = bench(xla, q, k, v)
    results = {"xla": t_xla}
    for bq, bk in [(256, 512), (512, 512), (256, 1024), (512, 1024), (1024, 1024)]:
        if bq > max(sq, 128) or bk > max(skv, 512): continue
        pal = jax.jit(functools.partial(flash_attention, use_pallas=True, block_q=bq, block_k=bk))
        try:
            results[f"pallas {bq}x{bk}"] = bench(pal, q, k, v)
        except Exception as e:
            results[f"pallas {bq}x{bk}"] = f"FAIL {type(e).__name__}"
    print(shape, {k2: (round(v2, 3) if isinstance(v2, float) else v2) for k2, v2 in results.items()})
