"""VAE decode latency at 512x512 (batch 1/4), f32 vs bf16."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu import models as M

cfg = M.VAEConfig.sd()
params = M.init_vae(jax.random.PRNGKey(0), cfg)

def bench(b, dtype):
    p = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    z = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4), jnp.float32)
    @jax.jit
    def dec(p, z):
        return M.vae_decode(cfg, p, z)
    float(jnp.float32(dec(p, z).mean()))
    z2 = z * 1.0001
    t0 = time.perf_counter()
    float(jnp.float32(dec(p, z2).mean()))
    dt = time.perf_counter() - t0
    print(f"vae decode b{b} {dtype}: {dt*1e3:.1f} ms ({dt*1e3/b:.1f} ms/img)")

bench(1, "float32")
bench(1, "bfloat16")
bench(4, "bfloat16")
