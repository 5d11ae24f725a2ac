"""Chunked-Pallas vs XLA GroupNorm inside the VAE decode: scan-based A/B.

min-of-3 of a 5-decode scan at batch 1 and 4, f32 activations (the product
default) — the decision evidence for the chunked-GN dispatch threshold.
"""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.models import layers as L
import complex_prompt_diffusion_tpu.ops.groupnorm as G

cfg = M.VAEConfig.sd()
params0 = M.init_vae(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda a: jnp.asarray(a, "bfloat16"), params0)

REPS = 5


def timed(tag, b):
    z0 = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4), jnp.float32)

    @jax.jit
    def run(p, z):
        def body(c, _):
            y = M.vae_decode(cfg, p, c)
            return c + jnp.mean(y).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, z, None, length=REPS)
        return c

    float(jnp.float32(run(params, z0).mean()))
    best = 1e9
    for i in range(3):
        z = z0 * (1.0 + 1e-4 * (i + 1))
        t0 = time.perf_counter()
        float(jnp.float32(run(params, z).mean()))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / REPS
    print(f"{tag} b{b}: {ms:.1f} ms/decode = {ms/b:.1f} ms/img")
    return ms


orig = G._dispatch


def xla_only(x, gamma, beta, num_groups, eps, silu, use_pallas, interpret=False):
    n, h, w, c = x.shape
    if h * w * c * 4 > G._VMEM_BUDGET:  # big sites -> XLA (old behavior)
        return G._gn_xla(x, gamma, beta, num_groups, eps, silu)
    return orig(x, gamma, beta, num_groups, eps, silu, use_pallas, interpret)


for b in (1, 4):
    timed("chunked", b)
    G._dispatch = xla_only
    timed("xla-big", b)
    G._dispatch = orig
