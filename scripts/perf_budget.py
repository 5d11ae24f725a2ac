"""Round-3 per-component time budget (VERDICT item 1).

Accounts every ms of the CFG step by ablating ONE component at a time inside
the full 50-step DDIM scan — the only measurement this backend reports
reliably (docs/PERF.md "Measurement warning": per-op micro-benchmarks are
dispatch-floor-dominated; end-to-end scans and their A/B diffs are not).

Each variant monkeypatches a single component with a shape-preserving,
dependence-keeping stand-in (so XLA cannot DCE upstream work), re-jits the
whole render, and reports min-of-3 end-to-end times. diff(baseline, variant)
= that component's in-context cost, including the fusion/layout interactions
a standalone micro-bench misses. The lines sum to the step time by
construction (up to fusion overlap, which shows up as the residual).

Usage:
  python scripts/perf_budget.py --batch 4 [--steps 50] [--variants a,b,c]
"""

import argparse
import json
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
from complex_prompt_diffusion_tpu.models import layers as L
import complex_prompt_diffusion_tpu.models.unet as U

# `ops/__init__` re-exports the `attention` *function*, shadowing the
# submodule attribute — `import ...ops.attention as A` would bind the
# function. Resolve the module object explicitly.
import importlib

A = importlib.import_module("complex_prompt_diffusion_tpu.ops.attention")


# --------------------------------------------------------------------------
# stand-ins (shape-preserving, dependence-keeping)
# --------------------------------------------------------------------------


def _attn_passthrough(q, k, v, num_heads, scale=None, use_pallas=None):
    # output [B, Sq, inner] depends on q AND v (so neither projection DCEs)
    return q + jnp.mean(v, axis=1, keepdims=True)


def _mha_filter(pred):
    """mha stand-in that only ablates sites matching pred(sq, kv)."""
    real = A.attention

    def f(q, k, v, num_heads, scale=None, use_pallas=None):
        if pred(q.shape[1], k.shape[1]):
            return _attn_passthrough(q, k, v, num_heads, scale, use_pallas)
        return real(q, k, v, num_heads, scale, use_pallas=use_pallas)

    return f


def _bhds_passthrough(q_t, k_t, v_t, *, scale, block_q, interpret):
    # keeps BOTH relayouts + the ones-row concat; skips only the kernel
    d = q_t.shape[1]
    return q_t * 1.000001 + jnp.mean(v_t[:, :d, :], axis=2, keepdims=True)


def _conv_standin(params, x, stride=1, padding=None):
    """Channel slice/pad + bias: no matmul, keeps the data dependence and
    the exact output shape (incl. stride)."""
    k = params["kernel"].shape
    cout = k[3]
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    cin = x.shape[-1]
    if cin >= cout:
        y = x[..., :cout]
    else:
        y = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cout - cin)))
    return y + params["bias"].astype(x.dtype)


def _conv_filter(pred):
    real = L.conv2d

    def f(params, x, stride=1, padding=None):
        if pred(params["kernel"].shape, x.shape):
            return _conv_standin(params, x, stride, padding)
        return real(params, x, stride, padding)

    return f


def _conv_center_tap(params, x, stride=1, padding=None):
    """3x3 conv -> 1x1 conv with the center tap (1/9 the FLOPs, same MXU
    regime as a projection). Isolates the spatial-taps cost from the
    channel-contraction cost."""
    k = params["kernel"]
    if k.shape[0] == 3:
        return jax.lax.conv_general_dilated(
            x, k[1:2, 1:2].astype(x.dtype), (stride, stride), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["bias"].astype(x.dtype)
    return _REAL["conv2d"](params, x, stride, padding)


_REAL = {}


def _patch(variant: str):
    """Apply the named ablation; returns an undo fn."""
    _REAL.setdefault("mha", U.mha)
    _REAL.setdefault("conv2d", L.conv2d)
    _REAL.setdefault("geglu_ff", U.geglu_ff)
    _REAL.setdefault("gn", U.L.group_norm_p)
    _REAL.setdefault("gns", U.L.group_norm_silu_p)
    _REAL.setdefault("ln", U.L.layer_norm)
    _REAL.setdefault("bhds", A._onepass_attention_bhds)

    undo = []

    def set_unet_mha(f):
        U.mha = f
        undo.append(lambda: setattr(U, "mha", _REAL["mha"]))

    def set_conv(f):
        # U._apply_* call L.conv2d via the L module ref inside models.unet
        U.L.conv2d = f
        undo.append(lambda: setattr(U.L, "conv2d", _REAL["conv2d"]))

    if variant == "baseline":
        pass
    elif variant == "no_attn":
        set_unet_mha(_attn_passthrough)
    elif variant == "attn_relayout_only":
        A._onepass_attention_bhds = _bhds_passthrough
        A._onepass_merged_diff.cache_clear()
        A._onepass_attention_diff.cache_clear()
        def _undo_bhds():
            A._onepass_attention_bhds = _REAL["bhds"]
            A._onepass_merged_diff.cache_clear()
            A._onepass_attention_diff.cache_clear()
        undo.append(_undo_bhds)
    elif variant.startswith("no_attn_s"):
        s = int(variant[len("no_attn_s"):])
        set_unet_mha(_mha_filter(lambda sq, kv, s=s: sq == s and kv == sq))
    elif variant == "no_attn_cross":
        set_unet_mha(_mha_filter(lambda sq, kv: kv != sq))
    elif variant == "attn_xla":
        # kernel-vs-XLA in context: route every attention site to XLA
        set_unet_mha(
            lambda q, k, v, num_heads, scale=None, use_pallas=None:
            _REAL["mha"](q, k, v, num_heads, scale, use_pallas=False)
        )
    elif variant == "ff_xla":
        U.geglu_ff = (
            lambda y, wp, bp, wo, bo, use_pallas=None:
            _REAL["geglu_ff"](y, wp, bp, wo, bo, use_pallas=False)
        )
        undo.append(lambda: setattr(U, "geglu_ff", _REAL["geglu_ff"]))
    elif variant == "gn_xla":
        U.L.group_norm_p = (
            lambda p, x, num_groups=32, eps=1e-5, **kw:
            _REAL["gn"](p, x, num_groups, eps, use_pallas=False)
        )
        U.L.group_norm_silu_p = (
            lambda p, x, num_groups=32, eps=1e-5, **kw:
            _REAL["gns"](p, x, num_groups, eps, use_pallas=False)
        )
        undo.append(lambda: setattr(U.L, "group_norm_p", _REAL["gn"]))
        undo.append(lambda: setattr(U.L, "group_norm_silu_p", _REAL["gns"]))
    elif variant == "no_ff":
        U.geglu_ff = lambda y, wp, bp, wo, bo, use_pallas=None: y
        undo.append(lambda: setattr(U, "geglu_ff", _REAL["geglu_ff"]))
    elif variant == "no_groupnorm":
        U.L.group_norm_p = lambda p, x, num_groups=32, eps=1e-5, **kw: x
        U.L.group_norm_silu_p = (
            lambda p, x, num_groups=32, eps=1e-5, **kw: L.silu(x)
        )
        undo.append(lambda: setattr(U.L, "group_norm_p", _REAL["gn"]))
        undo.append(lambda: setattr(U.L, "group_norm_silu_p", _REAL["gns"]))
    elif variant == "no_layernorm":
        U.L.layer_norm = lambda p, x, eps=1e-5: x
        undo.append(lambda: setattr(U.L, "layer_norm", _REAL["ln"]))
    elif variant == "conv3_center_tap":
        set_conv(_conv_center_tap)
    elif variant == "no_conv3":
        set_conv(_conv_filter(lambda k, xs: k[0] == 3))
    elif variant.startswith("no_conv3_h"):
        hh = int(variant[len("no_conv3_h"):])
        set_conv(_conv_filter(lambda k, xs, hh=hh: k[0] == 3 and xs[1] == hh))
    elif variant == "no_conv1":
        set_conv(_conv_filter(lambda k, xs: k[0] == 1))
    elif variant == "no_upconv":
        # subpixel decoder upsample convs (models/layers.py
        # conv3x3_after_upsample2x) bypass conv2d — ablate separately:
        # shape-preserving upsample + broadcast bias keeps the dependence
        _REAL.setdefault("upconv", U.L.conv3x3_after_upsample2x)

        def up_standin(p, x):
            y = U.L.upsample_nearest2x(x[..., : p["kernel"].shape[-1]])
            co = p["kernel"].shape[-1]
            if y.shape[-1] < co:
                y = jnp.concatenate(
                    [y] * (co // y.shape[-1] + 1), axis=-1
                )[..., :co]
            return y + p["bias"].astype(y.dtype)

        U.L.conv3x3_after_upsample2x = up_standin
        undo.append(
            lambda: setattr(U.L, "conv3x3_after_upsample2x", _REAL["upconv"])
        )
    elif variant == "no_temb":
        # zero the per-ResBlock emb contribution: DCEs the emb linear at
        # every ResBlock AND the whole timestep-embedding MLP upstream —
        # upper-bounds what precomputing a per-step emb table could save
        _REAL.setdefault("apply_res", U._apply_res)

        def res_no_emb(p, cfg, h, emb, mode):
            x = h
            hh = U.L.group_norm_silu_p(p["in_norm"], h, use_pallas=cfg.use_pallas)
            if mode == "up":
                hh = U.L.upsample_nearest2x(hh)
                x = U.L.upsample_nearest2x(x)
            elif mode == "down":
                hh = U.L.avg_pool2x(hh)
                x = U.L.avg_pool2x(x)
            hh = U.L.conv2d(p["in_conv"], hh)
            hh = U.L.group_norm_silu_p(p["out_norm"], hh, use_pallas=cfg.use_pallas)
            hh = U.L.conv2d(p["out_conv"], hh)
            if "skip" in p:
                x = U.L.conv2d(p["skip"], x)
            return x + hh

        U._apply_res = res_no_emb
        undo.append(lambda: setattr(U, "_apply_res", _REAL["apply_res"]))
    elif variant == "no_unet":
        def trivial(cfg, p, x, t, ctx, y=None, **kw):
            s = jnp.mean(ctx.astype(jnp.float32)) + jnp.sum(
                t.astype(jnp.float32) * 0
            )
            return x[..., :4].astype(jnp.float32) * 0.999 + s * 1e-6
        _REAL.setdefault("unet_apply", M.unet_apply)
        M.unet_apply = trivial
        undo.append(lambda: setattr(M, "unet_apply", _REAL["unet_apply"]))
    else:
        raise SystemExit(f"unknown variant {variant}")

    def _undo():
        for f in reversed(undo):
            f()

    return _undo


DEFAULT_VARIANTS = [
    "baseline",
    "no_attn",
    "attn_relayout_only",
    "no_attn_s4096",
    "no_attn_s1024",
    "no_attn_s256",
    "no_attn_cross",
    "no_ff",
    "no_groupnorm",
    "no_layernorm",
    "no_conv3",
    "conv3_center_tap",
    "no_conv3_h64",
    "no_conv3_h32",
    "no_conv3_h16",
    "no_conv3_h8",
    "no_conv1",
    "no_unet",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--variants", type=str, default=",".join(DEFAULT_VARIANTS))
    ap.add_argument("--block-q", type=int, default=0, help="force one-pass block_q")
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

    if args.block_q:
        A._onepass_block_q = lambda sq, kv, _b=args.block_q: min(
            _b, ((sq + 127) // 128) * 128
        )

    def make_run():
        @jax.jit
        def run(p, x_T, k):
            def unet_eps(x, t, ctx):
                return M.unet_apply(unet_cfg, p, x, t, ctx)

            eps_fn, _ = make_denoiser(unet_eps, spec, gcfg=gcfg)
            x0, _ = SA.sample_ddim(eps_fn, x_T, itables, uc_scales, key=k)
            return x0

        return run

    def measure(run):
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
        return min(ts)

    results = {}
    base_ms = None
    for variant in args.variants.split(","):
        undo = _patch(variant)
        try:
            t0 = time.perf_counter()
            dt = measure(make_run())
            compile_s = time.perf_counter() - t0 - dt * (args.repeats)
        finally:
            undo()
        per_step_ms = dt / s * 1e3
        if variant == "baseline":
            base_ms = per_step_ms
        row = {
            "per_step_ms": round(per_step_ms, 3),
            "total_s": round(dt, 3),
        }
        if base_ms is not None and variant != "baseline":
            row["delta_ms"] = round(base_ms - per_step_ms, 3)
        results[variant] = row
        print(json.dumps({variant: row}), flush=True)

    print("\n=== budget (batch %d, %d steps) ===" % (args.batch, s))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
