"""Headline benchmark: SD-1.5 512x512, DDIM-50, CFG 7.5 — images/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
reported against the UNet speed-of-light bound on this chip: SD-1.5 at 512^2
is ~0.68 TFLOP per UNet call per image (BASELINE.md:14); a 50-step DDIM
render with CFG (uncond+cond batched through one call, 2x work) costs
~68 TFLOP/image. On a v5e chip (~197 bf16 TFLOP/s) speed-of-light is
~2.9 images/s; vs_baseline = achieved / speed_of_light.

Runs with random bf16 weights (weights don't affect runtime). Usage:
  python bench.py            # full benchmark (SD-1.5 shapes)
  python bench.py --small    # tiny config smoke run (CPU-friendly)
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the 50-step SD UNet scan is expensive to compile
# on this host; cache across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_e2e(args):
    """End-to-end row (VERDICT r2 item 5): tokenize -> CLIP encode ->
    sampling scan -> VAE decode, ALL inside the timed region — the honest
    "images out per wall second" number, vs the scan-only headline."""
    from complex_prompt_diffusion_tpu.pipeline import (
        ModelBundle, RenderConfig, txt2img,
    )

    on_tpu = jax.default_backend() == "tpu"
    bundle = ModelBundle.random("sd15" if on_tpu and not args.small else "tiny")
    if on_tpu:
        bundle = bundle.cast("bfloat16")
    if getattr(args, "vae_bf16", False):
        bundle = bundle.cast_vae("bfloat16")
    size = 512 if on_tpu and not args.small else 32
    steps = args.steps if on_tpu and not args.small else 2
    cfg = RenderConfig(
        steps=steps, width=size, height=size, batch_size=args.batch,
        tome_ratio=getattr(args, "tome", 0.0),
        tome_mode=getattr(args, "tome_mode", "downsample"),
        deepcache_interval=getattr(args, "deepcache", 0),
    )
    prompts = [
        "a photograph of an astronaut riding a horse, seed %d" % i
        for i in range(args.repeats + 1)
    ]
    # warmup compiles tokenizer+CLIP+scan+VAE-decode jits
    imgs, _ = txt2img(bundle, prompts[0], cfg=cfg)
    assert imgs is not None and imgs.dtype == np.uint8
    times = []
    for i in range(args.repeats):
        # distinct prompt text per run: the tunnel memoizes identical RPCs
        t0 = time.perf_counter()
        imgs, _ = txt2img(bundle, prompts[1 + i], cfg=cfg)
        assert imgs.shape[0] == args.batch
        times.append(time.perf_counter() - t0)
    dt = min(times)
    images_per_sec = args.batch / dt
    metric = (
        "images/sec/chip e2e(tokenize+CLIP+scan+VAEdecode) "
        "SD1.5 512x512 DDIM-50 CFG7.5"
        if on_tpu and not args.small
        else "images/sec/chip e2e tiny smoke"
    )
    if getattr(args, "tome", 0.0) > 0.0:
        tag = "ToDo" if getattr(args, "tome_mode", "") == "downsample" else "ToMe"
        metric += f" +{tag}{args.tome:g} (approx)"
    if getattr(args, "deepcache", 0) >= 2:
        metric += f" +DeepCache{args.deepcache} (approx)"
    result = {
        "metric": metric,
        "value": round(images_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(
            images_per_sec / (197e12 / (0.68e12 * 2 * steps)), 4
        )
        if on_tpu and not args.small
        else 0.0,
        "total_s_per_batch": round(dt, 3),
        "steps": steps,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


def bench_latency(args):
    """Fastest-single-image rows (VERDICT r3 item 7): seconds to first
    image, end-to-end (tokenize+CLIP+scan+decode+host u8) at batch 1 with
    the batch-1 levers composed — exact path, then the labeled approximate
    operating point (DeepCache interval 3 + ToDo 0.75; error table in
    docs/PERF.md "Approximate-mode error")."""
    from complex_prompt_diffusion_tpu.pipeline import (
        ModelBundle, RenderConfig, txt2img,
    )

    on_tpu = jax.default_backend() == "tpu"
    bundle = ModelBundle.random("sd15" if on_tpu and not args.small else "tiny")
    if on_tpu:
        bundle = bundle.cast("bfloat16").cast_vae("bfloat16")
    size = 512 if on_tpu and not args.small else 32
    steps = args.steps if on_tpu and not args.small else 2
    prompts = [
        "a photograph of an astronaut riding a horse, seed %d" % i
        for i in range(args.repeats + 1)
    ]
    for tag, kw in (
        ("exact", {}),
        ("approx DeepCache3+ToDo0.75", dict(
            deepcache_interval=3, tome_ratio=0.75, tome_mode="downsample")),
    ):
        cfg = RenderConfig(
            steps=steps, width=size, height=size, batch_size=1, **kw
        )
        imgs, _ = txt2img(bundle, prompts[0], cfg=cfg)  # warmup/compile
        assert imgs is not None and imgs.dtype == np.uint8
        times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            imgs, _ = txt2img(bundle, prompts[1 + i], cfg=cfg)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        metric = (
            f"seconds-to-first-image e2e batch1 {tag} "
            "SD1.5 512x512 DDIM-50 CFG7.5 bf16-decode"
            if on_tpu and not args.small
            else f"seconds-to-first-image tiny smoke {tag}"
        )
        print(json.dumps({
            "metric": metric,
            "value": round(dt, 3),
            "unit": "seconds",
            "vs_baseline": 0.0,
            "steps": steps,
            "backend": jax.default_backend(),
        }))


def bench_e2e_stream(args):
    """THE HEADLINE (default bench mode since round 4): streamed end-to-end
    throughput — tokenize + CLIP encode + 50-step scan + VAE decode + u8
    host transfer for a stream of batches, with each batch's decode/transfer
    dispatched asynchronously so the ~35 ms/img tunnel transfer hides behind
    the next batch's scan (scripts/perf_e2e.py budget; VERDICT r3 items 1-2).

    Round-5 shape (VERDICT r4 items 1-2): the negative/uncond embedding is
    encoded ONCE per stream (it is identical every batch — the per-batch
    re-encode was pure overhead), and the decode dtype is explicit: the
    exact f32-decode row prints first, the bf16-decode row (pixel delta
    under 1 u8 level, docs/PERF.md "Approximate-mode error") prints LAST as
    the headline, tagged ``bf16-decode`` in the metric string."""
    from complex_prompt_diffusion_tpu.pipeline import (
        ModelBundle, RenderConfig, _decode_latents_u8_jit, encode_prompt,
        sample_latents,
    )
    from complex_prompt_diffusion_tpu.guidance import GuidanceSpec

    on_tpu = jax.default_backend() == "tpu"
    full = on_tpu and not args.small
    bundle = ModelBundle.random("sd15" if full else "tiny")
    if on_tpu:
        bundle = bundle.cast("bfloat16", donate=True)
    size = 512 if full else 32
    steps = args.steps if full else 2
    cfg = RenderConfig(
        steps=steps, width=size, height=size, batch_size=args.batch,
    )
    n_stream = args.stream
    prompts = [
        "a photograph of an astronaut riding a horse, seed %d" % i
        for i in range(3 * (n_stream + 1))
    ]
    neg = "blurry, low quality"

    def stream(b, prompt_list):
        imgs = []
        pending = []
        uncond = encode_prompt(b, neg)[0]  # once per stream, not per batch
        for i, prompt in enumerate(prompt_list):
            spec = GuidanceSpec.single(encode_prompt(b, prompt)[0], uncond)
            lat = sample_latents(b, spec, cfg, key=jax.random.PRNGKey(31 + i))
            pending.append(
                _decode_latents_u8_jit(b.vae_cfg, b.vae_params, lat)
            )
            if len(pending) > 1:
                imgs.append(np.asarray(pending.pop(0)))
        while pending:
            imgs.append(np.asarray(pending.pop(0)))
        return imgs

    sol = 197e12 / (0.68e12 * 2 * steps)
    # scripts/roofline.py: the folklore 0.68 TF/img undercounts the real
    # CFG-step FLOPs (projections/FF) — exact enumeration is 1.531 TF per
    # image-step incl. CFG. vs_baseline keeps the 0.68-based convention
    # (BASELINE.md); vs_sol_exact_flops reports against the exact count.
    sol_exact = 197e12 / (1.531e12 * steps)
    rows = [("exact-f32-decode", bundle)]
    if on_tpu:
        rows.append(("bf16-decode", bundle.cast_vae("bfloat16")))
    for tag, b in rows:
        off = 0 if tag == "exact-f32-decode" else (n_stream + 1)
        stream(b, prompts[off : off + 1])  # compile warmup
        t0 = time.perf_counter()
        imgs = stream(b, prompts[off + 1 : off + 1 + n_stream])
        dt = time.perf_counter() - t0
        assert len(imgs) == n_stream and imgs[0].dtype == np.uint8
        images_per_sec = n_stream * args.batch / dt
        metric = (
            "images/sec/chip e2e streamed (tok+CLIP+scan+VAEdecode+host) "
            f"SD1.5 512x512 DDIM-50 CFG7.5 {tag}"
            if full
            else f"images/sec/chip e2e streamed tiny smoke {tag}"
        )
        print(json.dumps({
            "metric": metric,
            "value": round(images_per_sec, 4),
            "unit": "images/sec",
            "vs_baseline": round(images_per_sec / sol, 4) if full else 0.0,
            "vs_sol_exact_flops": round(images_per_sec / sol_exact, 4)
            if full else 0.0,
            "stream_batches": n_stream,
            "batch": args.batch,
            "steps": steps,
            "backend": jax.default_backend(),
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=50)
    # batch 4 is this chip's measured throughput sweet spot (b1: 1.04,
    # b4: 1.47; b8 ties b4 via auto megabatch chunking — docs/PERF.md
    # round-3 batch tables)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--unroll", type=int, default=1,
        help="lax.scan unroll factor for the sampling loop (A/B knob)",
    )
    ap.add_argument(
        "--unet-chunk", dest="unet_chunk", type=int, default=0,
        help="max UNet sub-batch per call (0 = auto: 8 on TPU; -1 = never "
        "split; pipeline RenderConfig.unet_batch_chunk semantics)",
    )
    ap.add_argument(
        "--e2e", action="store_true",
        help="time tokenize+CLIP encode+scan+VAE decode (honest end-to-end)",
    )
    ap.add_argument(
        "--vae-bf16", dest="vae_bf16", action="store_true",
        help="opt-in bf16 autoencoder for the e2e decode (docs/PERF.md)",
    )
    ap.add_argument(
        "--tome", type=float, default=0.0,
        help="opt-in token reduction at the S>=4096 self-attention sites "
        "(approximate: the metric is labeled accordingly)",
    )
    ap.add_argument(
        "--tome-mode", default="downsample", choices=["downsample", "merge"],
        help="token-reduction mode: ToDo K/V pooling or ToMe-SD merging",
    )
    ap.add_argument(
        "--deepcache", type=int, default=0,
        help="opt-in DeepCache interval: full UNet every Nth step, shallow "
        "level-0-only retrieval in between (approximate: labeled)",
    )
    ap.add_argument(
        "--latency", action="store_true",
        help="fastest-single-image mode: batch-1 e2e seconds-to-first-image "
        "rows (exact + labeled approximate operating point)",
    )
    ap.add_argument(
        "--scan", dest="scan_only", action="store_true",
        help="scan-only row (the pre-round-4 headline): sampling loop "
        "without CLIP/decode/transfer",
    )
    ap.add_argument(
        "--stream", type=int, default=6,
        help="number of batches in the streamed e2e headline (default 6 — "
        "long enough that the pipeline-fill and tail-transfer edges stop "
        "dominating; the metric reports steady-state serving throughput "
        "and labels the batch count)",
    )
    args = ap.parse_args()

    if args.latency:
        bench_latency(args)
        return
    if args.scan_only:
        bench_scan(args)
        return
    if args.e2e:
        # both rows: the scan-only reference, then the per-render
        # (unstreamed) e2e number
        bench_scan(args)
        bench_e2e(args)
        return
    # DEFAULT = the honest headline: streamed end-to-end images/sec
    # (tokenize+CLIP+scan+decode+host transfer; VERDICT r3 item 1)
    bench_e2e_stream(args)


def bench_scan(args):
    from complex_prompt_diffusion_tpu import models as M
    from complex_prompt_diffusion_tpu import samplers as SA
    from complex_prompt_diffusion_tpu import schedules as S
    from complex_prompt_diffusion_tpu.guidance import GuidanceSpec, make_denoiser
    from complex_prompt_diffusion_tpu.guidance.cfg import make_uc_scale_schedule, GuidanceConfig

    on_tpu = jax.default_backend() == "tpu"
    if args.small or not on_tpu:
        unet_cfg = M.UNetConfig.tiny(context_dim=64)
        h = w = 16
        ctx_dim = 64
        flops_per_call = None
        args.batch = 1
    else:
        unet_cfg = M.UNetConfig.sd15()
        h = w = 64  # 512x512 image
        ctx_dim = 768
        flops_per_call = 0.68e12 * 2  # CFG doubles the batch
    if getattr(args, "tome", 0.0) > 0.0:
        import dataclasses

        unet_cfg = dataclasses.replace(
            unet_cfg, tome_ratio=args.tome,
            tome_mode=getattr(args, "tome_mode", "downsample"),
        )

    key = jax.random.PRNGKey(0)
    params = M.init_unet(key, unet_cfg)
    if on_tpu:
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)

    tables = S.make_diffusion_tables()
    itables = S.make_inference_tables(tables, args.steps, eta=0.0)
    s = itables.num_steps

    cond = jax.random.normal(jax.random.fold_in(key, 1), (77, ctx_dim))
    uncond = jax.random.normal(jax.random.fold_in(key, 2), (77, ctx_dim))
    spec = GuidanceSpec.single(cond, uncond)
    gcfg = GuidanceConfig(guidance_scale=7.5)

    uc_scales = jnp.asarray(make_uc_scale_schedule(gcfg, s), jnp.float32)

    # params threaded as a jit ARG — closing over them would embed 1.7GB of
    # weight constants into the XLA module and blow up compile time
    from complex_prompt_diffusion_tpu.guidance.cfg import stacked_context

    @jax.jit
    def run(p, x_T, k):
        # cross-attention k/v are loop-invariant: hoist them out of the scan
        kv = M.precompute_cross_kv(
            unet_cfg, p, stacked_context(spec, x_T.shape[0])
        )

        dc = getattr(args, "deepcache", 0)
        if dc >= 2:
            from complex_prompt_diffusion_tpu.guidance.cfg import (
                _batched_inputs, cfg_epsilon_deepcache,
            )

            chunk = args.unet_chunk
            if chunk == 0:
                chunk = 8 if on_tpu else -1
            unet_full, unet_shallow = M.make_deepcache_unets(
                unet_cfg, p, None, cross_kv=kv, batch_chunk=chunk
            )

            deep_sd = jax.eval_shape(
                lambda x_: unet_full(
                    *_batched_inputs(x_, jnp.zeros((), jnp.float32), spec, None)
                )[1],
                x_T,
            )

            def eps_fn(x, t, uc, blur, i, st):
                return cfg_epsilon_deepcache(
                    unet_full, unet_shallow, x, t, spec, uc,
                    (i % dc) == 0, st, gcfg=gcfg, uc_blur_on=blur,
                )

            x0, _ = SA.sample_ddim(
                eps_fn, x_T, itables, uc_scales, key=k, unroll=args.unroll,
                eps_state=jnp.zeros(deep_sd.shape, deep_sd.dtype),
            )
            return x0

        # Megabatch chunking (mirrors pipeline RenderConfig.unet_batch_chunk
        # auto dispatch): the UNet-batch-8 schedule is this chip's
        # throughput optimum; wider single calls are superlinearly slower
        # (PERF.md batch-8 root cause; scripts/perf_batch_split.py).
        chunk = args.unet_chunk
        if chunk == 0:
            chunk = 8 if on_tpu else -1

        def unet_eps(x, t, ctx):
            b = x.shape[0]
            if chunk > 0 and b > chunk:
                outs = []
                for lo in range(0, b, chunk):
                    sl = slice(lo, min(lo + chunk, b))
                    kv_i = jax.tree.map(lambda a: a[sl], kv)
                    outs.append(
                        M.unet_apply(
                            unet_cfg, p, x[sl], t[sl], ctx[sl], cross_kv=kv_i
                        )
                    )
                return jnp.concatenate(outs, axis=0)
            return M.unet_apply(unet_cfg, p, x, t, ctx, cross_kv=kv)

        eps_fn, _ = make_denoiser(unet_eps, spec, gcfg=gcfg)
        x0, _ = SA.sample_ddim(
            eps_fn, x_T, itables, uc_scales, key=k, unroll=args.unroll
        )
        return x0

    shape = (args.batch, h, w, 4)

    # compile + warmup (x_T donated: re-make per call)
    def make_xT(i):
        return jax.random.normal(jax.random.fold_in(key, 100 + i), shape, jnp.float32)

    def materialize(out):
        # this backend's block_until_ready does not actually block; force a
        # host transfer so timings cover real device execution
        return float(jnp.float32(out.mean()))

    materialize(run(params, make_xT(0), jax.random.PRNGKey(1)))

    times = []
    for i in range(args.repeats):
        x_T = make_xT(1 + i)
        t0 = time.perf_counter()
        materialize(run(params, x_T, jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    images_per_sec = args.batch / dt
    per_step_ms = dt / s * 1000.0

    if flops_per_call is not None:
        chip_flops = 197e12  # v5e bf16
        sol_images_per_sec = chip_flops / (flops_per_call * s)
        vs_baseline = images_per_sec / sol_images_per_sec
    else:
        vs_baseline = 0.0

    metric = (
        "images/sec/chip SD1.5 512x512 DDIM-50 CFG7.5"
        if not (args.small or not on_tpu)
        else "images/sec/chip tiny-unet smoke"
    )
    if getattr(args, "tome", 0.0) > 0.0:
        tag = "ToDo" if getattr(args, "tome_mode", "") == "downsample" else "ToMe"
        metric += f" +{tag}{args.tome:g} (approx)"
    if getattr(args, "deepcache", 0) >= 2:
        metric += f" +DeepCache{args.deepcache} (approx)"
    result = {
        "metric": metric,
        "value": round(images_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 4),
        "per_step_ms": round(per_step_ms, 2),
        "steps": s,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
