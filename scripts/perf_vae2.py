"""VAE decode component split at 512x512 (batch 4, bf16).

Ablation method as scripts/perf_budget.py: swap ONE component for a
shape-preserving stand-in, jit a 5-decode scan (amortizes the ~25 ms
dispatch overhead), min-of-3. Guides whether a chunked-stats Pallas
GroupNorm (>16 MB samples) is worth building for the e2e decode path.
"""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.models import layers as L

cfg = M.VAEConfig.sd()
params0 = M.init_vae(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda a: jnp.asarray(a, "bfloat16"), params0)
z0 = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 4), jnp.float32)

REPS = 5


def timed(tag):
    @jax.jit
    def run(p, z):
        def body(c, _):
            y = M.vae_decode(cfg, p, c)
            # fold the image back into a latent-shaped carry so each rep
            # depends on the last (no DCE) with fresh values
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
    print(f"{tag}: {ms:.1f} ms/decode(b4) = {ms/4:.1f} ms/img")
    return ms


base = timed("baseline")

# GN stand-in: per-channel affine only (keeps dtype/shape/dataflow, drops
# the stats reductions and normalize passes)
orig_gn = L.group_norm_p, L.group_norm_silu_p


def fake_gn(p, x, num_groups=32, eps=1e-5, use_pallas=None):
    y = x * p["scale"] + p["bias"]
    return y


def fake_gn_silu(p, x, num_groups=32, eps=1e-5, use_pallas=None):
    y = x * p["scale"] + p["bias"]
    return y * jax.nn.sigmoid(y)


L.group_norm_p, L.group_norm_silu_p = fake_gn, fake_gn_silu
import complex_prompt_diffusion_tpu.models.vae as V

V.L.group_norm_p, V.L.group_norm_silu_p = fake_gn, fake_gn_silu
no_gn = timed("no_groupnorm")
V.L.group_norm_p, V.L.group_norm_silu_p = orig_gn
L.group_norm_p, L.group_norm_silu_p = orig_gn

print(f"GN share: {base - no_gn:.1f} ms/decode = {(base-no_gn)/4:.2f} ms/img")
