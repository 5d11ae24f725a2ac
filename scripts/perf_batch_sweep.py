"""Batch/block_q sweep (VERDICT r3 item 2: explain or fix the batch-8
regression — 0.42 vs 0.453 vs_baseline at batch 4 is the wrong direction
for a throughput metric).

Sweeps the headline bench (full 50-step DDIM scan, the only reliable
timing on this backend) over batch sizes and one-pass attention query
blocks. Run:
  python scripts/perf_batch_sweep.py --batches 4,6,8 --blocks 0,512,1024,2048
(block 0 = the shipped _onepass_block_q heuristic).
"""

import argparse
import json
import subprocess
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
)
# `ops/__init__` re-exports the `attention` function, shadowing the
# submodule attribute; resolve the module object explicitly.
import importlib

A = importlib.import_module("complex_prompt_diffusion_tpu.ops.attention")


def run_one(batch: int, block_q: int, steps: int, repeats: int):
    unet_cfg = M.UNetConfig.sd15()
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16), M.init_unet(key, unet_cfg)
    )
    tables = S.make_diffusion_tables()
    itables = S.make_inference_tables(tables, steps, eta=0.0)
    s = itables.num_steps
    cond = jax.random.normal(jax.random.fold_in(key, 1), (77, 768))
    uncond = jax.random.normal(jax.random.fold_in(key, 2), (77, 768))
    spec = GuidanceSpec.single(cond, uncond)
    gcfg = GuidanceConfig(guidance_scale=7.5)
    uc_scales = jnp.asarray(make_uc_scale_schedule(gcfg, s), jnp.float32)

    if block_q:
        orig = A._onepass_block_q
        A._onepass_block_q = lambda sq, kv, _b=block_q: min(
            _b, ((sq + 127) // 128) * 128
        )

    @jax.jit
    def run(p, x_T, k):
        def unet_eps(x, t, ctx):
            return M.unet_apply(unet_cfg, p, x, t, ctx)

        eps_fn, _ = make_denoiser(unet_eps, spec, gcfg=gcfg)
        x0, _ = SA.sample_ddim(eps_fn, x_T, itables, uc_scales, key=k)
        return x0

    shape = (batch, 64, 64, 4)

    def xT(i):
        return jax.random.normal(
            jax.random.fold_in(key, 100 + i), shape, jnp.float32
        )

    float(jnp.float32(run(params, xT(0), jax.random.PRNGKey(1)).mean()))
    ts = []
    for i in range(repeats):
        t0 = time.perf_counter()
        float(jnp.float32(run(params, xT(1 + i), jax.random.PRNGKey(2 + i)).mean()))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    if block_q:
        A._onepass_block_q = orig
    ips = batch / dt
    return {
        "batch": batch,
        "block_q": block_q,
        "images_per_sec": round(ips, 4),
        "per_step_ms": round(dt / s * 1e3, 2),
        "vs_baseline": round(ips / (197e12 / (0.68e12 * 2 * s)), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="4,8")
    ap.add_argument("--blocks", type=str, default="0")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    for b in [int(x) for x in args.batches.split(",")]:
        for bq in [int(x) for x in args.blocks.split(",")]:
            r = run_one(b, bq, args.steps, args.repeats)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
