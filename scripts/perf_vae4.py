"""VAE decode GN A/B round 2: xla_mm variants vs the chunked Pallas path.

f32 activations (product default) and bf16 (opt-in cast_vae):
  f32:  auto(=chunked@b4/xla@b1)  vs  xla_mm2 (two-pass, exact)  vs
        xla_mm (one-pass E[x^2], parity caveat)  vs  xla (reshape)
  bf16: auto(=xla_mm after the round-3 dispatch change)  vs
        pallas-chunked (the previous default)
"""
import time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu import models as M
import complex_prompt_diffusion_tpu.ops.groupnorm as G

cfg = M.VAEConfig.sd()
params0 = M.init_vae(jax.random.PRNGKey(0), cfg)
params_bf = jax.tree.map(lambda a: jnp.asarray(a, "bfloat16"), params0)
params_f32 = params0

REPS = 5


def timed(tag, b, params, zdt):
    z0 = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4), zdt)

    @jax.jit
    def run(p, z):
        def body(c, _):
            y = M.vae_decode(cfg, p, c)
            return c + jnp.mean(y).astype(c.dtype), ()
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
    print(f"{tag} b{b}: {ms:.1f} ms/decode = {ms/b:.1f} ms/img", flush=True)
    return ms


orig = G._dispatch


def force(impl):
    def d(x, gamma, beta, num_groups, eps, silu, use_pallas, interpret=False):
        return impl(x, gamma, beta, num_groups, eps, silu)
    return d


# the f32 product path: decode runs in f32 (weights bf16, activations
# promote) — x dtype at the GN sites is f32
for b in (1, 4):
    timed("f32 auto      ", b, params_bf, jnp.float32)
    G._dispatch = force(G._gn_xla_mm2)
    timed("f32 xla_mm2   ", b, params_bf, jnp.float32)
    G._dispatch = force(G._gn_xla_mm)
    timed("f32 xla_mm    ", b, params_bf, jnp.float32)
    G._dispatch = force(G._gn_xla)
    timed("f32 xla       ", b, params_bf, jnp.float32)
    G._dispatch = orig

# bf16 opt-in path (ModelBundle.cast_vae): activations stay bf16
bf_params = jax.tree.map(lambda a: jnp.asarray(a, "bfloat16"), params0)
for b in (1, 4):
    timed("bf16 auto(mm) ", b, bf_params, jnp.bfloat16)
    G._GN_IMPL = "pallas"
    timed("bf16 pallas   ", b, bf_params, jnp.bfloat16)
    G._GN_IMPL = "auto"
