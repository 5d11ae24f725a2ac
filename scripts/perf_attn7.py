"""Attention tuning at bench batch (B=8): self-attn block sweep + cross-attn
(kv=77) pallas-vs-xla."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu.ops.attention import flash_attention

REPS, ITERS = 10, 5

def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out.mean()))
    args = tuple(a * 1.0001 for a in args)
    t0 = time.perf_counter()
    float(jnp.float32(fn(*args).mean()))
    return (time.perf_counter() - t0) / (ITERS * REPS) * 1e3

def self_case(bh, s, d, bq, bk):
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, 1, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, 1, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, 1, s, d), jnp.bfloat16)
    scale = d ** -0.5
    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            def step(j, a):
                return flash_attention(a, k, v, scale, block_q=bq, block_k=bk) * 0.999
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, q)
    print(f"self BH{bh} S{s} d{d} blocks {bq}x{bk}: {timeit(run, q, k, v):7.3f} ms")

def cross_case(bh, s, kv, d, mode):
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, 1, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, 1, kv, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, 1, kv, d), jnp.bfloat16)
    scale = d ** -0.5
    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            def step(j, a):
                if mode == "pallas":
                    o = flash_attention(a, k, v, scale)
                else:
                    w = jax.nn.softmax((a @ jnp.swapaxes(k, -1, -2)) * scale, axis=-1)
                    o = (w @ v).astype(a.dtype)
                return o * 0.999
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, q)
    print(f"cross BH{bh} S{s} kv{kv} d{d} {mode}: {timeit(run, q, k, v):7.3f} ms")

# level-0 self-attn at bench batch
for bq, bk in ((1024, 2048), (2048, 2048), (2048, 4096), (1024, 4096), (4096, 4096), (512, 4096)):
    self_case(64, 4096, 40, bq, bk)
# level-1 self (S=1024, d=80, BH=64)
for bq, bk in ((1024, 1024), (512, 1024), (1024, 2048)):
    self_case(64, 1024, 80, bq, bk)
# cross-attn kv=77 at levels 0/1
for mode in ("pallas", "xla"):
    cross_case(64, 4096, 77, 40, mode)
    cross_case(64, 1024, 77, 80, mode)
    cross_case(64, 256, 77, 160, mode)
