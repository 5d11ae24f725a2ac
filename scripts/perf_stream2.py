"""A/B: streamed e2e with (a) per-batch 2x CLIP encodes + inline transfers
(round-4 shape) vs (b) hoisted uncond encode + background-thread transfers.
Tests whether the tunnel D2H serializes against device compute and what the
uncond hoist is worth."""
import time, json
from concurrent.futures import ThreadPoolExecutor
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu.pipeline import (
    ModelBundle, RenderConfig, _decode_latents_u8_jit, _clip_encode_jit,
    make_guidance_spec, sample_latents, encode_prompt,
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
N = 4
prompts = ["astronaut riding a horse, v%d s%d" % (v, i) for v in range(4) for i in range(N)]

def stream_a(ps):  # round-4 shape
    imgs, pending = [], []
    for i, p in enumerate(ps):
        spec = make_guidance_spec(bundle, p, neg)
        lat = sample_latents(bundle, spec, cfg, key=jax.random.PRNGKey(31 + i))
        pending.append(_decode_latents_u8_jit(bundle.vae_cfg, bundle.vae_params, lat))
        if len(pending) > 1:
            imgs.append(np.asarray(pending.pop(0)))
    while pending:
        imgs.append(np.asarray(pending.pop(0)))
    return imgs

def stream_b(ps):  # hoisted uncond + threaded transfer
    uncond = encode_prompt(bundle, neg)[0]
    with ThreadPoolExecutor(1) as ex:
        futs = []
        for i, p in enumerate(ps):
            spec = GuidanceSpec.single(encode_prompt(bundle, p)[0], uncond)
            lat = sample_latents(bundle, spec, cfg, key=jax.random.PRNGKey(31 + i))
            d = _decode_latents_u8_jit(bundle.vae_cfg, bundle.vae_params, lat)
            futs.append(ex.submit(np.asarray, d))
        return [f.result() for f in futs]

import sys
print("warmup a", flush=True)
stream_a(prompts[:1])
print("warmup b", flush=True)
stream_b(prompts[1:2])
print("warmup done", flush=True)
out = {}
for name, fn, off in (("a_inline", stream_a, 0), ("b_hoist_thread", stream_b, 0)):
    ts = []
    for rep in range(2):
        batch = prompts[rep*N:(rep+1)*N] if name == "a_inline" else prompts[(2+rep)*N:(3+rep)*N]
        print("run", name, rep, flush=True)
        t0 = time.perf_counter(); imgs = fn(batch); ts.append(time.perf_counter() - t0)
        assert len(imgs) == N and imgs[0].dtype == np.uint8
    out[name] = {"min_s": round(min(ts), 3), "imgs_per_s": round(N*4/min(ts), 4)}
print(json.dumps(out))
