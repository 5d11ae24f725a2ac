"""Batch-8 regression follow-up: does SPLITTING the CFG megabatch UNet call
into sequential half-batch calls beat the single wide call?

PERF.md (batch-8 root cause) measured the superlinearity as VMEM-pressure
scheduling at BH=128 attention grid rows — context interaction, not
kernel-intrinsic. If that is right, two sequential BH=64 programs should
recover the batch-4 per-image cost (each half re-establishes the b4
schedule), at the price of whatever per-call overhead XLA adds.

Times one full UNet step at UNet batch 16 (= render batch 8 with CFG):
  * one B16 call (the shipped path)
  * 2 sequential B8 calls (concat halves)
  * 4 sequential B4 calls
All in one jit'd fori_loop, forced materialization (block_until_ready is a
no-op under the tunnel), perturbed inputs between timed calls.
"""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu import models as M

cfg = M.UNetConfig.sd15()
params = jax.tree.map(
    lambda a: jnp.asarray(a, jnp.bfloat16), M.init_unet(jax.random.PRNGKey(0), cfg)
)
B = 16  # render batch 8, CFG-doubled
x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 4), jnp.float32)
t = jnp.ones((B,))
c = jax.random.normal(jax.random.PRNGKey(2), (B, 77, 768))
ITERS = 10


def bench(tag, chunks):
    nb = B // chunks

    @jax.jit
    def loop(p, x, t, c):
        def call(xx):
            if chunks == 1:
                return M.unet_apply(cfg, p, xx, t, c)
            outs = [
                M.unet_apply(
                    cfg, p, xx[i * nb : (i + 1) * nb],
                    t[i * nb : (i + 1) * nb], c[i * nb : (i + 1) * nb],
                )
                for i in range(chunks)
            ]
            return jnp.concatenate(outs, axis=0)

        def body(i, acc):
            return acc * 0.5 + call(acc[..., :4]) * 0.5

        return jax.lax.fori_loop(0, ITERS, body, x)

    float(jnp.float32(loop(params, x, t, c).mean()))  # compile+warm
    best = 1e9
    for r in range(3):
        x2 = x * (1.0 + 1e-4 * (r + 1))
        t0 = time.perf_counter()
        float(jnp.float32(loop(params, x2, t, c).mean()))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{tag}: {best:.2f} ms/step ({best / 8:.2f} ms/img)")


bench("1x B16 (shipped)", 1)
bench("2x B8 sequential", 2)
bench("4x B4 sequential", 4)
