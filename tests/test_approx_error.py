"""Approximate-mode error regression guards (VERDICT r3 item 3).

The headline-config speed-error table lives in docs/PERF.md
("Approximate-mode error", measured on the chip at SD-1.5 512² DDIM-50);
these tests pin the MECHANISM at tiny scale: each approximation's latent
deviation from the exact path must stay in its measured band — nonzero
(the mode really approximates) and below an upper bound ~3x the measured
tiny-scale value (a regression guard against the cached/reduced path
silently drifting, not a quality judgment).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from complex_prompt_diffusion_tpu.pipeline import (
    ModelBundle,
    RenderConfig,
    decode_latents,
    make_guidance_spec,
    sample_latents,
)

BASE = dict(steps=8, width=32, height=32, batch_size=2)

# measured on the CPU tier at this exact config (fixed weights/seed/noises);
# bounds give ~3x headroom for platform/codegen variation
BANDS = {
    "dc2": (1e-4, 0.016),    # measured 0.0054
    "dc3": (1e-4, 0.023),    # measured 0.0076
    "todo": (1e-4, 0.008),   # measured 0.0026
    "tome": (1e-4, 0.013),   # measured 0.0043
}


@pytest.fixture(scope="module")
def setup():
    bundle = ModelBundle.random("tiny")
    spec = make_guidance_spec(bundle, "a cat", "blurry")
    x_T0 = np.asarray(
        jax.random.normal(jax.random.PRNGKey(42), (2, 4, 4, 4), jnp.float32)
    )
    noises = jnp.asarray(
        np.random.RandomState(0).randn(8, 2, 4, 4, 4), jnp.float32
    )
    exact = np.asarray(sample_latents(
        bundle, spec, RenderConfig(**BASE),
        x_init=jnp.asarray(x_T0), noises=noises,
    ))
    return bundle, spec, x_T0, noises, exact


def _rel_rmse(lat, exact):
    rms = float(np.sqrt(np.mean(exact.astype(np.float64) ** 2)))
    return float(
        np.sqrt(np.mean((lat - exact).astype(np.float64) ** 2))
    ) / rms


@pytest.mark.parametrize(
    "tag,kw",
    [
        ("dc2", dict(deepcache_interval=2)),
        ("dc3", dict(deepcache_interval=3)),
        ("todo", dict(tome_ratio=0.75, tome_mode="downsample")),
        ("tome", dict(tome_ratio=0.75, tome_mode="merge")),
    ],
)
def test_approx_deviation_within_band(setup, tag, kw):
    bundle, spec, x_T0, noises, exact = setup
    if "tome_ratio" in kw:
        # token reduction gates on S>=tome_min_seq; tiny latents are 16
        # tokens, so lower the gate to exercise the mechanism
        bundle = dataclasses.replace(
            bundle,
            unet_cfg=dataclasses.replace(bundle.unet_cfg, tome_min_seq=16),
        )
    lat = np.asarray(sample_latents(
        bundle, spec, RenderConfig(**BASE, **kw),
        x_init=jnp.asarray(x_T0), noises=noises,
    ))
    rel = _rel_rmse(lat, exact)
    lo, hi = BANDS[tag]
    assert lo < rel < hi, (
        f"{tag}: latent relRMSE {rel:.5f} outside measured band "
        f"({lo}, {hi}) — the approximate path drifted (or became exact)"
    )


def test_bf16_decode_pixel_delta(setup):
    # the bf16-VAE default decision (docs/PERF.md): pixels move by well
    # under one u8 level on average, a few levels at most
    bundle, _, _, _, exact = setup
    img = decode_latents(bundle, jnp.asarray(exact)).astype(np.int32)
    img_bf = decode_latents(
        bundle.cast_vae("bfloat16"), jnp.asarray(exact)
    ).astype(np.int32)
    d = np.abs(img_bf - img)
    assert float(d.mean()) < 1.0, float(d.mean())
    assert int(d.max()) <= 4, int(d.max())
