"""Round-5 decode attack: bf16 VAE decode component split at 512^2 batch 4.

perf_vae2.py budgeted the f32 decode (62.4 ms/img, GN 39.7). The shipped
bf16 path is ~31.8 ms/img vs a ~8-10 ms/img flops+bandwidth floor — where
do the other ~22 ms live? Ablation stand-ins as perf_budget.py (marginal
cost: each component swapped alone for a near-free shape-preserving
stand-in inside a jitted 5-decode scan, min-of-3).
"""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.models import layers as L
import complex_prompt_diffusion_tpu.models.vae as V

on_tpu = jax.default_backend() == "tpu"
import dataclasses

cfg = dataclasses.replace(
    M.VAEConfig.sd() if on_tpu else M.VAEConfig.tiny(), dtype="bfloat16"
)
params = M.init_vae(jax.random.PRNGKey(0), cfg, commit=False)
import numpy as _np
params = jax.device_put(
    jax.tree.map(lambda a: _np.asarray(a).astype("bfloat16"), params)
)
hw = 64 if on_tpu else 4
z0 = jax.random.normal(jax.random.PRNGKey(1), (4, hw, hw, 4), jnp.float32)
REPS = 5


def timed(tag):
    @jax.jit
    def run(p, z):
        def body(c, _):
            y = V.vae_decode(cfg, p, c)
            c2 = c + jnp.mean(y).astype(c.dtype)
            return c2, ()
        c, _ = jax.lax.scan(body, z, None, length=REPS)
        return c

    float(jnp.float32(run(params, z0).mean()))
    best = 1e9
    for i in range(3):
        z = z0 * (1.0 + 1e-4 * (i + 1))
        t0 = time.perf_counter()
        float(jnp.float32(run(params, z).mean()))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / REPS
    print(f"{tag}: {ms:.1f} ms/decode(b4) = {ms/4:.1f} ms/img", flush=True)
    return ms


base = timed("baseline")

orig_gn, orig_gns = L.group_norm_p, L.group_norm_silu_p
orig_conv2d = L.conv2d
orig_attn = V._attn_block
orig_subpix = L.conv3x3_after_upsample2x


def fake_gn(p, x, num_groups=32, eps=1e-5, use_pallas=None):
    return x * p["scale"] + p["bias"]


def fake_gn_silu(p, x, num_groups=32, eps=1e-5, use_pallas=None):
    y = x * p["scale"] + p["bias"]
    return y * jax.nn.sigmoid(y)


def fake_conv_maker(kh_target):
    def fake_conv2d(p, x, stride=1, padding=None):
        k = p["kernel"]
        if k.shape[0] == kh_target:
            # near-free stand-in preserving [N,H,W,cout] + dataflow
            y = x[..., :1].astype(k.dtype) * p["bias"]
            if stride == 2:
                y = y[:, ::2, ::2]
            return y
        return orig_conv2d(p, x, stride=stride, padding=padding)
    return fake_conv2d


def patch(**kw):
    for name, fn in kw.items():
        setattr(L, name, fn)
        setattr(V.L, name, fn)


def unpatch():
    patch(group_norm_p=orig_gn, group_norm_silu_p=orig_gns,
          conv2d=orig_conv2d, conv3x3_after_upsample2x=orig_subpix)
    V._attn_block = orig_attn


patch(group_norm_p=fake_gn, group_norm_silu_p=fake_gn_silu)
no_gn = timed("no_groupnorm")
unpatch()

V._attn_block = lambda p, x: x
no_attn = timed("no_midattn")
unpatch()

patch(conv2d=fake_conv_maker(3))
no_c3 = timed("no_conv3x3")
unpatch()

patch(conv2d=fake_conv_maker(1))
no_c1 = timed("no_conv1x1")
unpatch()

patch(conv3x3_after_upsample2x=lambda p, x: (
    L.upsample_nearest2x(x)[..., :1].astype(p["kernel"].dtype) * p["bias"]))
no_up = timed("no_upconv")
unpatch()

print("--- marginal shares (ms/img, b4):")
for tag, v in [("GN", no_gn), ("mid-attn", no_attn), ("conv3x3", no_c3),
               ("conv1x1", no_c1), ("upconv", no_up)]:
    print(f"  {tag}: {(base - v)/4:.2f}")
