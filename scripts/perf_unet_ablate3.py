"""UNet ablations with forced materialization (block_until_ready is a no-op
on this backend)."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.models import layers as L
import complex_prompt_diffusion_tpu.models.unet as U

cfg = M.UNetConfig.sd15()
params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), M.init_unet(jax.random.PRNGKey(0), cfg))
x = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 4), jnp.float32)
t = jnp.ones((8,)); c = jax.random.normal(jax.random.PRNGKey(2), (8, 77, 768))
ITERS = 10

def bench(tag):
    @jax.jit
    def loop(p, x, t, c):
        def body(i, acc):
            out = M.unet_apply(cfg, p, acc[..., :4], t, c)
            return acc * 0.5 + out * 0.5
        return jax.lax.fori_loop(0, ITERS, body, x)
    float(jnp.float32(loop(params, x, t, c).mean()))  # compile+warm
    x2 = x * 1.0001
    t0 = time.perf_counter()
    float(jnp.float32(loop(params, x2, t, c).mean()))
    print(tag, round((time.perf_counter() - t0) / ITERS * 1e3, 2), "ms/call")

bench("full")

og, ogs = U.L.group_norm_p, U.L.group_norm_silu_p
U.L.group_norm_p = lambda p, x, num_groups=32, eps=1e-5: x
U.L.group_norm_silu_p = lambda p, x, num_groups=32, eps=1e-5: L.silu(x)
bench("no groupnorm")
U.L.group_norm_p, U.L.group_norm_silu_p = og, ogs

om = U.mha
U.mha = lambda q, k, v, num_heads, scale=None, use_pallas=None: q
bench("no attention(mha)")
U.mha = om

U.mha = lambda q, k, v, num_heads, scale=None, use_pallas=None: __import__("complex_prompt_diffusion_tpu.ops.attention", fromlist=["attention"]).attention(q, k, v, num_heads, scale, use_pallas=False)
bench("xla attention")
U.mha = om
