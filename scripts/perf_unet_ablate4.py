"""Round-2 fine ablation: split the 46 ms "conv+rest" bucket.

Replaces conv classes with shape-preserving near-free stand-ins to bound
each class's cost (fori floor caveat applies: deltas < ~1 ms are noise).
"""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.models import layers as L
import complex_prompt_diffusion_tpu.models.unet as U

cfg = M.UNetConfig.sd15()
params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), M.init_unet(jax.random.PRNGKey(0), cfg))
B = 8
x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 4), jnp.float32)
t = jnp.ones((B,)); c = jax.random.normal(jax.random.PRNGKey(2), (B, 77, 768))
ITERS = 10

def bench(tag):
    @jax.jit
    def loop(p, x, t, c):
        def body(i, acc):
            out = M.unet_apply(cfg, p, acc[..., :4], t, c)
            return acc * 0.5 + out * 0.5
        return jax.lax.fori_loop(0, ITERS, body, x)
    float(jnp.float32(loop(params, x, t, c).mean()))
    x2 = x * 1.0001
    t0 = time.perf_counter()
    float(jnp.float32(loop(params, x2, t, c).mean()))
    print(tag, round((time.perf_counter() - t0) / ITERS * 1e3, 2), "ms/call", flush=True)

def fake_conv(p, x, stride=1, padding=None):
    # correct output shape at ~zero cost: strided slice + single-channel
    # broadcast-to-out_ch via tiny matmul
    k = p["kernel"]
    out_ch = k.shape[3]
    y = x[:, ::stride, ::stride, :1]
    return jnp.broadcast_to(y, y.shape[:3] + (out_ch,)).astype(x.dtype)

bench("full")

oc = L.conv2d
# all convs bypassed (conv_in/res/skip/up/down/out + attn proj convs if any)
U.L.conv2d = fake_conv
bench("no conv2d at all")
U.L.conv2d = oc

# only 3x3 convs bypassed (kernel size 3), keep 1x1
def conv_3x3_off(p, x, stride=1, padding=None):
    if p["kernel"].shape[0] == 3:
        return fake_conv(p, x, stride, padding)
    return oc(p, x, stride, padding)
U.L.conv2d = conv_3x3_off
bench("no 3x3 convs")
U.L.conv2d = oc

def conv_1x1_off(p, x, stride=1, padding=None):
    if p["kernel"].shape[0] == 1:
        return fake_conv(p, x, stride, padding)
    return oc(p, x, stride, padding)
U.L.conv2d = conv_1x1_off
bench("no 1x1 convs")
U.L.conv2d = oc

# linear layers (attn projections, ff, time emb)
ol = L.linear
def fake_linear(p, x):
    out_f = p["kernel"].shape[1]
    return jnp.broadcast_to(x[..., :1], x.shape[:-1] + (out_f,)).astype(x.dtype)
U.L.linear = fake_linear
bench("no linear (attn proj/ff/temb)")
U.L.linear = ol

# ff only: disable the transformer MLP by zeroing geglu? approximate by
# replacing silu-gated ff via attn-block bypass is complex; skip.

ou = L.upsample_nearest2x
U.L.upsample_nearest2x = lambda h: jnp.repeat(jnp.repeat(h, 1, 1), 1, 2) if False else h  # placeholder
# actually need shape change; use resize-free trick: broadcast
def fake_up(h):
    b, hh, ww, ch = h.shape
    return jnp.broadcast_to(h[:, :, None, :, None, :], (b, hh, 2, ww, 2, ch)).reshape(b, hh*2, ww*2, ch)
U.L.upsample_nearest2x = fake_up
bench("cheap upsample (sanity ~= full)")
U.L.upsample_nearest2x = ou
