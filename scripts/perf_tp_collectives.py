"""Count the collectives GSPMD inserts for the TP-8 UNet step (CPU mesh).

Batch-1 close-out evidence (docs/PERF.md): tensor parallelism's latency win
is bounded by (a) per-chip utilization of the shrunken matmuls and (b) the
collectives on the critical path. This script compiles the TP-sharded
SD-1.5 UNet CFG step over an 8-virtual-device CPU mesh and counts the
all-reduces/all-gathers actually inserted, so the analytic estimate in
PERF.md rests on the real partitioned program, not on the Megatron paper's
expected count.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/perf_tp_collectives.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import collections
import re

import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.models import unet as unet_mod
from complex_prompt_diffusion_tpu.parallel.mesh import make_mesh
from complex_prompt_diffusion_tpu.parallel.tp import shard_bundle
from complex_prompt_diffusion_tpu.pipeline import ModelBundle


def main():
    import sys

    scale = sys.argv[1] if len(sys.argv) > 1 else "sd15"
    tp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    assert len(jax.devices()) == 8, jax.devices()
    b = ModelBundle.random(scale)
    mesh = make_mesh(model=tp)
    tb = shard_bundle(b, mesh)  # ShardCtx use_pallas + NamedSharding weights

    def step(params, x, t, ctx):
        return unet_mod.unet_apply(tb.unet_cfg, params, x, t, ctx)

    cfg = tb.unet_cfg
    dt = cfg.compute_dtype
    x = jnp.zeros((2, 32, 32, cfg.in_channels), dt)  # CFG pair, tiny latent
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 77, cfg.context_dim), dt)
    lowered = jax.jit(step).lower(tb.unet_params, x, t, ctx)
    hlo = lowered.compile().as_text()

    # one definition per instruction: the opcode is preceded by a space
    # (after the result type, which may be a tuple) and followed by "(";
    # operand references are %-prefixed names and never match
    counts = collections.Counter()
    for op in ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
               "all-to-all"):
        counts[op] = len(re.findall(rf" {op}(?:-start)?\(", hlo))
    print({k: v for k, v in sorted(counts.items()) if v})


if __name__ == "__main__":
    main()
