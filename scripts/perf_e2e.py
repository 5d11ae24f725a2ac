"""End-to-end render budget (VERDICT r3 item 1).

Accounts every ms of the scan->e2e gap with CUMULATIVE A/B diffs of whole
renders — each line is the difference between two full txt2img variants, so
the ~25-30 ms per-dispatch tunnel overhead (docs/PERF.md "Measurement
warning") cancels per line instead of inflating per-component timings:

  A  txt2img full                  (tokenize+CLIP+x_T+scan+decode+host u8)
  B  txt2img decode=False          -> A-B = VAE decode + device->host
  B2 txt2img decode=False, latents materialized via mean only
                                   -> (decode split: jit exec vs transfer)
  D  txt2img(spec) decode=False    -> B-D = tokenize + CLIP encode (2 jits)
  C  sample_latents(spec, x_init)  -> D-C = x_T gen + spec plumbing
  C is the scan-only headline      (bench.py bench_scan equivalent)

Also times the isolated pieces (tokenize host-side, CLIP jit, decode jit)
as sanity cross-checks — these DO carry the dispatch overhead and are
labeled as such.

Usage: python scripts/perf_e2e.py [--batch 4] [--steps 50] [--repeats 3]
       [--vae-bf16]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from complex_prompt_diffusion_tpu.pipeline import (
    ModelBundle, RenderConfig, decode_latents, encode_prompt,
    make_guidance_spec, sample_latents, txt2img, _decode_latents_u8_jit,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--vae-bf16", action="store_true")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    bundle = ModelBundle.random("sd15" if on_tpu else "tiny")
    if on_tpu:
        bundle = bundle.cast("bfloat16")
    if args.vae_bf16:
        bundle = bundle.cast_vae("bfloat16")
    size = 512 if on_tpu else 32
    steps = args.steps if on_tpu else 2
    cfg = RenderConfig(
        steps=steps, width=size, height=size, batch_size=args.batch
    )
    lat_shape = (args.batch,) + cfg.latent_shape

    prompts = [
        "a photograph of an astronaut riding a horse, seed %d" % i
        for i in range(64)
    ]
    neg = "blurry, low quality"

    def mat(x):
        return float(jnp.float32(jnp.mean(jnp.asarray(x, jnp.float32))))

    class It:
        """Distinct inputs per timed call (the tunnel memoizes RPCs)."""

        def __init__(self):
            self.i = 0

        def prompt(self):
            self.i += 1
            return prompts[self.i % len(prompts)]

        def key(self):
            self.i += 1
            return jax.random.PRNGKey(1000 + self.i)

    it = It()
    spec0 = make_guidance_spec(bundle, prompts[0], neg)

    def timed(fn, label):
        fn()  # warmup/compile
        best = 1e9
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3
        print(f"{label:58s} {ms:9.1f} ms  ({ms / args.batch:7.1f} ms/img)",
              flush=True)
        return ms

    # --- cumulative whole-render variants ---------------------------------
    def run_A():
        imgs, _ = txt2img(bundle, it.prompt(), neg, cfg=cfg, key=it.key())
        assert imgs.dtype == np.uint8

    def run_B():
        _, lat = txt2img(
            bundle, it.prompt(), neg, cfg=cfg, key=it.key(), decode=False
        )
        mat(lat)

    def run_D():
        _, lat = txt2img(
            bundle, spec0, cfg=cfg, key=it.key(), decode=False
        )
        mat(lat)

    def run_C():
        k = it.key()
        x_T = jax.random.normal(k, lat_shape, jnp.float32)
        lat = sample_latents(bundle, spec0, cfg, x_init=x_T, key=k)
        mat(lat)

    a = timed(run_A, "A  e2e full (tok+CLIP+xT+scan+decode+host)")
    b = timed(run_B, "B  no decode")
    d = timed(run_D, "D  no decode, prebuilt spec")
    c = timed(run_C, "C  scan only (spec + x_init given)")

    # --- decode split: jit execution vs host transfer ---------------------
    lat0 = jax.random.normal(jax.random.PRNGKey(7), lat_shape, jnp.float32)

    def dec_exec():
        z = lat0 * (1.0 + 1e-4 * it.i)
        it.i += 1
        mat(_decode_latents_u8_jit(bundle.vae_cfg, bundle.vae_params, z))

    def dec_full():
        z = lat0 * (1.0 + 1e-4 * it.i)
        it.i += 1
        img = decode_latents(bundle, z)
        assert img.dtype == np.uint8

    de = timed(dec_exec, "decode jit exec only (mean materialize)")
    df = timed(dec_full, "decode + full u8 host transfer")

    # --- isolated sanity lines (carry dispatch overhead; labeled) ---------
    def tok_only():
        bundle.tokenizer([it.prompt()] * 1)

    def clip_only():
        mat(encode_prompt(bundle, it.prompt()))

    def xt_only():
        mat(jax.random.normal(it.key(), lat_shape, jnp.float32))

    t_tok = timed(tok_only, "tokenize only (host)")
    t_clip = timed(clip_only, "CLIP encode (1 jit call; incl dispatch)")
    t_xt = timed(xt_only, "x_T normal (1 jit call; incl dispatch)")

    print()
    print(f"A-B  decode+host transfer       : {a - b:8.1f} ms "
          f"({(a - b) / args.batch:6.1f} ms/img)")
    print(f"B-D  tokenize+CLIP encode (x2)  : {b - d:8.1f} ms")
    print(f"D-C  x_T gen + spec plumbing    : {d - c:8.1f} ms")
    print(f"C    scan                       : {c:8.1f} ms")
    print(f"sum of lines == A               : {(a - b) + (b - d) + (d - c) + c:8.1f}")
    print(f"decode transfer share (df-de)   : {df - de:8.1f} ms")
    print()
    print(f"e2e img/s: {args.batch / (a / 1e3):.4f}   "
          f"scan img/s: {args.batch / (c / 1e3):.4f}   "
          f"ratio: {c / a:.3f}")


if __name__ == "__main__":
    main()
