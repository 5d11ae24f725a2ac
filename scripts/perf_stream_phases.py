"""Phase timing for the streamed e2e headline (VERDICT r4 item 1): where do
the ~200 ms/batch between scan-only (1.479 img/s) and streamed e2e
(1.374 img/s) live? Times dispatch-return and block points separately for
tokenize / CLIP cond / CLIP uncond / x_T randn / scan / decode dispatch /
host transfer. Conclusion feeds docs/PERF.md round 5."""
import time, sys, json
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu.pipeline import (
    ModelBundle, RenderConfig, _decode_latents_u8_jit, _clip_encode_jit,
    make_guidance_spec, sample_latents,
)
from complex_prompt_diffusion_tpu.guidance import GuidanceSpec

on_tpu = jax.default_backend() == "tpu"
bundle = ModelBundle.random("sd15" if on_tpu else "tiny")
if on_tpu:
    bundle = bundle.cast("bfloat16").cast_vae("bfloat16")
size = 512 if on_tpu else 32
steps = 50 if on_tpu else 2
cfg = RenderConfig(steps=steps, width=size, height=size, batch_size=4)
neg = "blurry, low quality"
prompts = ["astronaut riding a horse, seed %d" % i for i in range(10)]

def t(f):
    t0 = time.perf_counter(); r = f(); return r, time.perf_counter() - t0

# warmup compile
spec = make_guidance_spec(bundle, prompts[0], neg)
lat = sample_latents(bundle, spec, cfg, key=jax.random.PRNGKey(0))
img = np.asarray(_decode_latents_u8_jit(bundle.vae_cfg, bundle.vae_params, lat))

phases = {}
pending = []
t_all0 = time.perf_counter()
for i in range(1, 5):
    row = {}
    toks, row["tokenize"] = t(lambda: jnp.asarray(bundle.tokenizer(prompts[i])))
    ntoks, row["tokenize_neg"] = t(lambda: jnp.asarray(bundle.tokenizer(neg)))
    c, row["clip_cond_dispatch"] = t(lambda: _clip_encode_jit(bundle.clip_cfg, bundle.clip_params, toks, bundle.clip_layer))
    u, row["clip_uncond_dispatch"] = t(lambda: _clip_encode_jit(bundle.clip_cfg, bundle.clip_params, ntoks, bundle.clip_layer))
    spec, row["spec_build"] = t(lambda: GuidanceSpec.single(c[0], u[0]))
    lat, row["scan_dispatch"] = t(lambda: sample_latents(bundle, spec, cfg, key=jax.random.PRNGKey(31 + i)))
    d, row["decode_dispatch"] = t(lambda: _decode_latents_u8_jit(bundle.vae_cfg, bundle.vae_params, lat))
    pending.append(d)
    if len(pending) > 1:
        _, row["block_prev_transfer"] = t(lambda: np.asarray(pending.pop(0)))
    phases[i] = row
_, tail = t(lambda: [np.asarray(p) for p in pending])
total = time.perf_counter() - t_all0
print(json.dumps({"phases": phases, "tail_s": round(tail,3), "total_s": round(total,3),
                  "imgs_per_s": round(16/total, 4)}, default=lambda x: round(float(x),4)))
