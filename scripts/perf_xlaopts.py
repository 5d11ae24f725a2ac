"""Sweep server-side XLA compiler options on the headline 50-step scan.

Host-side XLA_FLAGS cannot carry TPU flags under the axon tunnel (the local
parse_flags_from_env only knows CPU flags and aborts); jit(compiler_options=)
passes through to the backend compiler instead. Scoped VMEM is the
documented knob that changes conv/fusion tiling decisions.

Usage: python scripts/perf_xlaopts.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu import samplers as SA
from complex_prompt_diffusion_tpu import schedules as S
from complex_prompt_diffusion_tpu.guidance import GuidanceSpec, make_denoiser
from complex_prompt_diffusion_tpu.guidance.cfg import (
    GuidanceConfig,
    make_uc_scale_schedule,
    stacked_context,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
STEPS = 50

unet_cfg = M.UNetConfig.sd15()
key = jax.random.PRNGKey(0)
params = M.init_unet(key, unet_cfg)
params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)

tables = S.make_diffusion_tables()
itables = S.make_inference_tables(tables, STEPS, eta=0.0)
cond = jax.random.normal(jax.random.fold_in(key, 1), (77, 768))
uncond = jax.random.normal(jax.random.fold_in(key, 2), (77, 768))
spec = GuidanceSpec.single(cond, uncond)
gcfg = GuidanceConfig(guidance_scale=7.5)
uc_scales = jnp.asarray(make_uc_scale_schedule(gcfg, itables.num_steps))


def run(p, x_T, k):
    kv = M.precompute_cross_kv(unet_cfg, p, stacked_context(spec, x_T.shape[0]))

    def unet_eps(x, t, ctx):
        return M.unet_apply(unet_cfg, p, x, t, ctx, cross_kv=kv)

    eps_fn, _ = make_denoiser(unet_eps, spec, gcfg=gcfg)
    x0, _ = SA.sample_ddim(eps_fn, x_T, itables, uc_scales, key=k)
    return x0


def bench(opts, label):
    fn = jax.jit(run, compiler_options=opts or None)
    shape = (BATCH, 64, 64, 4)

    def make_xT(i):
        return jax.random.normal(
            jax.random.fold_in(key, 100 + i), shape, jnp.float32
        )

    try:
        float(jnp.float32(fn(params, make_xT(0), jax.random.PRNGKey(1)).mean()))
    except Exception as e:  # noqa: BLE001 - report and continue sweep
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    best = float("inf")
    for i in range(3):
        x_T = make_xT(1 + i)
        t0 = time.perf_counter()
        float(jnp.float32(fn(params, x_T, jax.random.PRNGKey(2 + i)).mean()))
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1000
    print(
        f"{label}: {ms:6.2f} ms/step  {BATCH/best:5.3f} img/s",
        flush=True,
    )


bench({}, "control")
for kib in ("32768", "65536", "98304"):
    bench({"xla_tpu_scoped_vmem_limit_kib": kib}, f"scoped_vmem={kib}")
bench(
    {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "latency_hiding_sched",
)
