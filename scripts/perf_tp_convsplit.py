"""Conv input-channel-split TP probe (VERDICT r3 item 6).

The shipped TP rules replicate convs (parallel/tp.py docstring); this probe
compiles the batch-1 SD-1.5 CFG UNet step on a virtual CPU mesh with the
conv kernels ADDITIONALLY input-channel-split over the model axis
(P(None,None,"model",None) on the HWIO kernels — each device contracts a
Cin shard, GSPMD psums the partial outputs), and reports for each variant:

  * collective counts from the partitioned program (the critical-path comm)
  * per-device FLOPs from XLA's cost analysis (the compute the split buys)

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/perf_tp_convsplit.py [sd15] [2 4]
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import collections
import re
import sys

import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu.models import unet as unet_mod
from complex_prompt_diffusion_tpu.parallel.mesh import make_mesh
from complex_prompt_diffusion_tpu.parallel.tp import shard_bundle
from complex_prompt_diffusion_tpu.pipeline import ModelBundle


def counts_of(hlo):
    c = collections.Counter()
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        c[op] = len(re.findall(rf" {op}(?:-start)?\(", hlo))
    return {k: v for k, v in c.items() if v}


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "sd15"
    tps = [int(a) for a in sys.argv[2:]] or [2, 4]
    b = ModelBundle.random(scale)

    for tp in tps:
        mesh = make_mesh(model=tp)
        for conv_split in (False, True):
            tb = shard_bundle(b, mesh, conv_split=conv_split)
            cfg = tb.unet_cfg
            dt = cfg.compute_dtype
            # batch-1 render = CFG megabatch 2, 512^2-image latent
            x = jnp.zeros((2, 64, 64, cfg.in_channels), dt)
            t = jnp.zeros((2,), jnp.int32)
            ctx = jnp.zeros((2, 77, cfg.context_dim), dt)
            compiled = jax.jit(
                lambda p, x, t, c: unet_mod.unet_apply(cfg, p, x, t, c)
            ).lower(tb.unet_params, x, t, ctx).compile()
            hlo = compiled.as_text()
            ca = compiled.cost_analysis()
            flops = (ca or {}).get("flops", float("nan"))
            print(
                f"tp={tp} conv_split={conv_split} "
                f"per-device GFLOPs={flops / 1e9:.1f} "
                f"collectives={counts_of(hlo)}"
            )


if __name__ == "__main__":
    main()
