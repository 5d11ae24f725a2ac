"""GroupNorm kernel cost at UNet sites, B=8."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu.ops.groupnorm import group_norm_silu, _gn_xla

REPS, ITERS = 30, 10

def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out.mean()))
    args = tuple(a * 1.0001 for a in args)
    t0 = time.perf_counter()
    float(jnp.float32(fn(*args).mean()))
    return (time.perf_counter() - t0) / (ITERS * REPS) * 1e3

def case(n, h, w, c, mode):
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), jnp.bfloat16)
    g = jnp.ones((c,), jnp.float32); b = jnp.zeros((c,), jnp.float32)
    @jax.jit
    def run(x, g, b):
        def body(i, acc):
            def step(j, a):
                if mode == "pallas":
                    return group_norm_silu(a, g, b, use_pallas=True) * 1.0001
                return _gn_xla(a, g, b, 32, 1e-5, True) * 1.0001
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, x)
    mb = n*h*w*c*2/1e6
    dt = timeit(run, x, g, b)
    print(f"gn_silu {n}x{h}x{w}x{c} ({mb:.0f}MB bf16) {mode}: {dt:7.3f} ms  {2*mb/dt:.0f} GB/s")

for mode in ("pallas", "xla"):
    case(8, 64, 64, 320, mode)
    case(8, 32, 32, 640, mode)
    case(8, 16, 16, 1280, mode)
    case(8, 8, 8, 1280, mode)
