"""Round-5: the SHIPPED decode program (_decode_latents_u8_jit) wall time at
batch 4, bf16 VAE, under each GN impl (env CPD_TPU_GN_IMPL) — did the
round-3 'xla_mm for <=16-bit' auto-route (a UNET-step win) silently slow
the VAE decode vs the chunked Pallas path PERF.md measured at 31.8 ms/img?
Run via: for impl in auto pallas xla xla_mm; do CPD_TPU_GN_IMPL=$impl python
scripts/perf_vae6.py; done"""
import os, time, json
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.models import vae as V
import dataclasses

on_tpu = jax.default_backend() == "tpu"
cfg = dataclasses.replace(
    M.VAEConfig.sd() if on_tpu else M.VAEConfig.tiny(), dtype="bfloat16"
)
params = M.init_vae(jax.random.PRNGKey(0), cfg, commit=False)
params = jax.device_put(jax.tree.map(lambda a: np.asarray(a).astype("bfloat16"), params))
hw = 64 if on_tpu else 4
import sys
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4

@jax.jit
def run(p, z):
    def body(c, i):
        img = V.vae_decode(cfg, p, z + 0.001 * i.astype(jnp.float32))
        img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
        u8 = jnp.round(img * 255).astype(jnp.uint8)
        return c + jnp.float32(u8.astype(jnp.float32).mean()), None
    s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(5))
    return s

z0 = jax.random.normal(jax.random.PRNGKey(1), (B, hw, hw, 4), jnp.float32)
float(run(params, z0))
ts = []
for i in range(3):
    z = jax.random.normal(jax.random.PRNGKey(2 + i), (B, hw, hw, 4), jnp.float32)
    t0 = time.perf_counter(); float(run(params, z)); ts.append(time.perf_counter() - t0)
print(json.dumps({"gn_impl": os.environ.get("CPD_TPU_GN_IMPL", "auto"),
                  "B": B, "ms_per_img": round(min(ts) / 5 / B * 1000, 2)}))
