"""Demo: end-to-end txt2img from a checkpoint (or random weights).

Usage:
  python scripts/demo_txt2img.py --ckpt sd-v1-5.ckpt --prompt "a cat" \
      --steps 50 --sampler "DPM++ 2m" --out out.png
Without --ckpt, runs a random-weight SD-1.5 (structure demo only).
"""
import argparse

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu.pipeline import ModelBundle, RenderConfig, txt2img
from complex_prompt_diffusion_tpu.utils import save_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--prompt", default="a photograph of an astronaut riding a horse")
    ap.add_argument("--negative", default="")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", default="DDIM")
    ap.add_argument("--scale", type=float, default=7.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="out.png")
    args = ap.parse_args()

    if args.ckpt:
        bundle = ModelBundle.from_checkpoint(args.ckpt).cast("bfloat16")
    else:
        print("no --ckpt: using RANDOM weights (output will be noise)")
        bundle = ModelBundle.random("sd15").cast("bfloat16")

    cfg = RenderConfig(
        steps=args.steps, sampler=args.sampler, guidance_scale=args.scale,
        width=args.size, height=args.size, seed=args.seed,
        sigma_schedule="karras" if args.sampler.lower().startswith("dpm") else "default",
    )
    images, _ = txt2img(bundle, args.prompt, args.negative, cfg)
    save_image(images[0], args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
