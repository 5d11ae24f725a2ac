"""Cross-attention (kv=77) dispatch A/B: XLA fused softmax (current) vs the
one-pass transposed Pallas kernel, merged [B, S, H*D] layout, bench batch."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
import sys
import complex_prompt_diffusion_tpu.ops.attention  # noqa: F401
A = sys.modules["complex_prompt_diffusion_tpu.ops.attention"]

PEAK = 197e12
REPS = 30
ITERS = 10

def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out.mean()))
    args = tuple(a * 1.0001 for a in args)
    t0 = time.perf_counter()
    float(jnp.float32(fn(*args).mean()))
    return (time.perf_counter() - t0) / (ITERS * REPS)

def case(b, s, kv, heads, d):
    inner = heads * d
    scale = d ** -0.5
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, inner), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, kv, inner), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, kv, inner), jnp.bfloat16)

    def xla_path(q, k, v):
        def split(x):
            return x.reshape(b, x.shape[1], heads, d).transpose(0, 2, 1, 3)
        o = A._xla_attention(split(q), split(k), split(v), scale)
        return o.transpose(0, 2, 1, 3).reshape(b, s, inner)

    bq = A._onepass_block_q(s, kv)
    onepass = A._onepass_merged_diff(scale, bq, heads, False)

    def chain(fn):
        @jax.jit
        def run(q, k, v):
            def body(i, acc):
                def step(j, a):
                    return fn(a, k, v) * 0.5 + a * 0.5
                return jax.lax.fori_loop(0, REPS, step, acc)
            return jax.lax.fori_loop(0, ITERS, body, q)
        return run

    dt_x = timeit(chain(xla_path), q, k, v)
    dt_p = timeit(chain(onepass), q, k, v)
    # exactness
    ref = xla_path(q, k, v)
    got = onepass(q, k, v)
    err = float(jnp.max(jnp.abs(jnp.float32(ref) - jnp.float32(got))))
    print(f"S{s} kv{kv} h{heads} d{d} B{b}: xla {dt_x*1e3:6.3f} ms | onepass {dt_p*1e3:6.3f} ms "
          f"| speedup {dt_x/dt_p:5.2f}x | maxerr {err:.2e}", flush=True)

B = 8
case(B, 4096, 77, 8, 40)
case(B, 1024, 77, 8, 80)
case(B, 256, 77, 8, 160)
case(B, 64, 77, 8, 160)
