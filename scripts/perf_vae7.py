"""Round-5 decode conv attack: per-plane XLA conv3x3 efficiency at the SD
VAE DECODER shapes (bf16) vs the MXU roofline.

Methodology (docs/PERF.md "Measurement pitfalls"): serial carry chain so no
conv can be hoisted, and LENGTH-DIFFERENCING (t(50)-t(10))/40 to cancel the
~25 ms per-dispatch overhead and the transfer. Square-channel shapes only
(the transitions are a minority of decode FLOPs)."""
import time, json
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

SHAPES = [(64, 512), (128, 512), (256, 256), (512, 128)]

def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

def time_n(B, hw, c, n):
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, hw, hw, c), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), jnp.bfloat16) * 0.02

    @jax.jit
    def run(x, k):
        def body(cst, _):
            return conv(cst, k), None
        cst, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.float32(cst.mean())

    float(run(x0, k))
    ts = []
    for i in range(3):
        x = x0 * (1 + 1e-4 * i)
        t0 = time.perf_counter(); float(run(x, k)); ts.append(time.perf_counter() - t0)
    return min(ts)

for B in (4, 8):
    for hw, c in SHAPES:
        t10 = time_n(B, hw, c, 10)
        t50 = time_n(B, hw, c, 50)
        ms = (t50 - t10) / 40 * 1000
        fl = 2 * 9 * hw * hw * c * c * B
        tf = fl / (ms / 1000) / 1e12
        print(json.dumps({"B": B, "hw": hw, "c": c, "ms": round(ms, 3),
                          "TFLOPs": round(tf, 1),
                          "mxu_frac": round(tf / 197, 3)}), flush=True)
