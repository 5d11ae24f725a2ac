"""Ablate UNet components to find the time sink."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.models import layers as L
from complex_prompt_diffusion_tpu import ops

cfg = M.UNetConfig.sd15()
params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), M.init_unet(jax.random.PRNGKey(0), cfg))
x = jnp.zeros((2, 64, 64, 4), jnp.float32)
t = jnp.ones((2,)); c = jnp.zeros((2, 77, 768))

def bench(tag):
    f = jax.jit(lambda p, x, t, c: M.unet_apply(cfg, p, x, t, c))
    f(params, x, t, c).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20): out = f(params, x, t, c)
    out.block_until_ready()
    print(tag, round((time.perf_counter() - t0) / 20 * 1e3, 2), "ms")

bench("full")

# identity group norms
orig_gn, orig_gns = L.group_norm_p, L.group_norm_silu_p
L.group_norm_p = lambda p, x, num_groups=32, eps=1e-5: x
L.group_norm_silu_p = lambda p, x, num_groups=32, eps=1e-5: L.silu(x)
import complex_prompt_diffusion_tpu.models.unet as U
U.L.group_norm_p = L.group_norm_p; U.L.group_norm_silu_p = L.group_norm_silu_p
bench("no groupnorm")
U.L.group_norm_p = orig_gn; U.L.group_norm_silu_p = orig_gns

# identity attention (keep projections out)
orig_mha = U.mha
U.mha = lambda q, k, v, num_heads, scale=None, use_pallas=None: q
bench("no attention")
U.mha = orig_mha

# bf16 input x
xb = x.astype(jnp.bfloat16)
f = jax.jit(lambda p, x, t, c: M.unet_apply(cfg, p, x, t, c))
f(params, xb, t, c).block_until_ready()
t0 = time.perf_counter()
for _ in range(20): out = f(params, xb, t, c)
out.block_until_ready()
print("bf16 input", round((time.perf_counter()-t0)/20*1e3, 2), "ms")
