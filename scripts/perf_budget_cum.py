"""Cumulative (nested) ablation audit (VERDICT r3 item 4).

The round-3 budget table is a MARGINAL-cost table: each component is
ablated alone, so in the all-XLA-fused regime the lines under-sum and 22%
of the step shows up as "fusion overlap" by subtraction. This script
removes components in a NESTED sequence — attention, then ALSO FF, then
also conv3, ... — so the deltas sum EXACTLY to (baseline - final) by
construction, and (cumulative delta - marginal delta) attributes the
overlap to specific component pairs: component i's cumulative delta is its
cost GIVEN everything before it in the order is already gone.

Patches compose: each component patches a distinct module attribute, and
the conv filters chain (each captures the previously-patched conv2d as its
fallthrough), so applying them in sequence nests correctly.

Usage: python scripts/perf_budget_cum.py [--batch 4] [--steps 50]
       [--marginals]   # also re-measure the marginal table this session
"""

import argparse
import importlib.util
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_here = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "perf_budget", os.path.join(_here, "perf_budget.py")
)
pb = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pb)

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu import samplers as SA
from complex_prompt_diffusion_tpu import schedules as S
from complex_prompt_diffusion_tpu.guidance import GuidanceSpec, make_denoiser
from complex_prompt_diffusion_tpu.guidance.cfg import (
    GuidanceConfig,
    make_uc_scale_schedule,
)

# nested removal order: biggest lines first (the round-3 marginal ranking)
CUM_ORDER = [
    "no_attn", "no_ff", "no_conv3", "no_groupnorm", "no_conv1",
    "no_layernorm", "no_upconv", "no_temb",
]
# round-3 marginal deltas (docs/PERF.md "Round-3 refreshed budget") for the
# pair-overlap attribution column when --marginals is not re-run
R3_MARGINALS = {
    "no_attn": 16.73, "no_ff": 10.15, "no_conv3": 9.83 + 1.48,  # + upconv?
    "no_groupnorm": 1.56, "no_conv1": 1.27, "no_layernorm": 0.65,
    "no_upconv": 1.48, "no_temb": 0.04,
}
R3_MARGINALS["no_conv3"] = 9.83


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--marginals", action="store_true")
    args = ap.parse_args()

    unet_cfg = M.UNetConfig.sd15()
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16), M.init_unet(key, unet_cfg)
    )
    tables = S.make_diffusion_tables()
    itables = S.make_inference_tables(tables, args.steps, eta=0.0)
    s = itables.num_steps
    cond = jax.random.normal(jax.random.fold_in(key, 1), (77, 768))
    uncond = jax.random.normal(jax.random.fold_in(key, 2), (77, 768))
    spec = GuidanceSpec.single(cond, uncond)
    gcfg = GuidanceConfig(guidance_scale=7.5)
    uc_scales = jnp.asarray(make_uc_scale_schedule(gcfg, s), jnp.float32)
    shape = (args.batch, 64, 64, 4)

    def make_run():
        @jax.jit
        def run(p, x_T, k):
            def unet_eps(x, t, ctx):
                return M.unet_apply(unet_cfg, p, x, t, ctx)

            eps_fn, _ = make_denoiser(unet_eps, spec, gcfg=gcfg)
            x0, _ = SA.sample_ddim(eps_fn, x_T, itables, uc_scales, key=k)
            return x0

        return run

    def measure():
        run = make_run()

        def xT(i):
            return jax.random.normal(
                jax.random.fold_in(key, 100 + i), shape, jnp.float32
            )

        float(jnp.float32(run(params, xT(0), jax.random.PRNGKey(1)).mean()))
        ts = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            float(
                jnp.float32(
                    run(params, xT(1 + i), jax.random.PRNGKey(2 + i)).mean()
                )
            )
            ts.append(time.perf_counter() - t0)
        return min(ts) / s * 1e3  # per-step ms

    marginals = dict(R3_MARGINALS)
    if args.marginals:
        for v in CUM_ORDER:
            undo = pb._patch(v)
            try:
                ms = measure()
            finally:
                undo()
            marginals[v] = None  # fill after baseline below
            print(json.dumps({"marginal_raw": {v: round(ms, 3)}}), flush=True)
            marginals[v] = ms

    base = measure()
    print(json.dumps({"baseline_per_step_ms": round(base, 3)}), flush=True)
    if args.marginals:
        marginals = {v: base - ms for v, ms in marginals.items()}

    undos = []
    prev = base
    rows = []
    try:
        for v in CUM_ORDER:
            undos.append(pb._patch(v))
            ms = measure()
            d = prev - ms
            marg = marginals.get(v)
            rows.append((v, d, marg, ms))
            print(json.dumps({
                "cum": v, "per_step_ms": round(ms, 3),
                "cum_delta_ms": round(d, 3),
                "marginal_ms": round(marg, 3) if marg is not None else None,
                "overlap_ms": round(d - marg, 3) if marg is not None else None,
            }), flush=True)
            prev = ms
    finally:
        for u in reversed(undos):
            u()

    # the all-removed floor vs the no_unet floor
    undo = pb._patch("no_unet")
    try:
        floor = measure()
    finally:
        undo()
    print(json.dumps({"no_unet_per_step_ms": round(floor, 3)}), flush=True)

    total = sum(d for _, d, _, _ in rows)
    print(f"\nbaseline {base:.2f} ms; cumulative deltas sum {total:.2f}; "
          f"final {prev:.2f}; no_unet {floor:.2f}")
    print(f"{'component':14s} {'cum Δms':>8s} {'marginal':>9s} {'overlap':>8s}")
    for v, d, marg, _ in rows:
        o = f"{d - marg:8.2f}" if marg is not None else "       -"
        m = f"{marg:9.2f}" if marg is not None else "        -"
        print(f"{v:14s} {d:8.2f} {m} {o}")


if __name__ == "__main__":
    main()
