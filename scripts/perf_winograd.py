"""Winograd F(2x2,3x3) vs XLA direct conv at the SD level shapes.

The perf budget (docs/PERF.md round 3) puts conv3x3 at 18.8 ms of the
60.3 ms batch-4 CFG step with XLA's direct conv at 59-73% SOL — "the
chip's matmul ceiling". That ceiling is measured against DIRECT-conv
FLOPs (9 multiplies per output point). Winograd F(2x2,3x3) computes the
same conv with 16 multiplies per 2x2 output tile = 4 per point (2.25x
fewer MXU FLOPs); the tile transforms are add-only VPU work. XLA:TPU
does not use Winograd, so if the batched [16] matmul formulation holds
>44% of the direct path's MXU efficiency it wins.

Formulation (all jnp, one jit):
  d: [B, H, W, C] -> 4x4 input tiles at stride 2 -> V = B^T d B
     (add-only butterflies, done as explicit elementwise sums)
  U = G g G^T per (c, co): [4, 4, C, Co], precomputed from the weights
  M[k] = V[k] @ U[k] for k in 0..15, batched dot_general
  Y = A^T M A -> [B, H/2, W/2, 2, 2, Co] -> [B, H, W, Co]

B^T, G, A for F(2x2,3x3) (coefficients in {0, 1, -1, 1/2} — exact in
bf16 except the halves, which we keep in the f32 weight transform only):
  B^T = [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]]
  G   = [[1, 0, 0], [1/2, 1/2, 1/2], [1/2, -1/2, 1/2], [0, 0, 1]]
  A^T = [[1, 1, 1, 0], [0, 1, -1, -1]]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

PEAK = 197e12
REPS = 30
ITERS = 10


def winograd_weights(g):
    """g: [3, 3, C, Co] -> U: [16, C, Co] (f32 transform, cast after)."""
    G = np.array(
        [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
    )
    g32 = g.astype(jnp.float32)
    # U = G @ g @ G^T over the two spatial axes
    u = jnp.einsum("ij,jkcf->ikcf", jnp.asarray(G), g32)
    u = jnp.einsum("ikcf,lk->ilcf", u, jnp.asarray(G))
    return u.reshape(16, *g.shape[2:])


def input_transform(d):
    """d: [B, H+2, W+2, C] padded input -> V: [16, B*T, C] where
    T = (H/2)*(W/2) tiles. Butterflies written as explicit adds."""
    b, hp, wp, c = d.shape
    h, w = hp - 2, wp - 2
    th, tw = h // 2, w // 2
    # gather the 4x4 tile grid: x[i, j] = d[:, 2*ti + i, 2*tj + j, :]
    x = [
        [
            jax.lax.slice(
                d, (0, i, j, 0), (b, i + 2 * th - 1, j + 2 * tw - 1, c),
                (1, 2, 2, 1),
            )
            for j in range(4)
        ]
        for i in range(4)
    ]
    # rows: t[i] = B^T applied along the first spatial index
    t0 = [x[0][j] - x[2][j] for j in range(4)]
    t1 = [x[1][j] + x[2][j] for j in range(4)]
    t2 = [x[2][j] - x[1][j] for j in range(4)]
    t3 = [x[1][j] - x[3][j] for j in range(4)]
    rows = [t0, t1, t2, t3]
    v = []
    for i in range(4):
        r = rows[i]
        v.extend([r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3]])
    vt = jnp.stack(v, 0)  # [16, B, th, tw, C]
    return vt.reshape(16, b * th * tw, c), (b, th, tw)


def output_transform(m, meta, co):
    """m: [16, B*T, Co] -> y: [B, H, W, Co]."""
    b, th, tw = meta
    m = m.reshape(4, 4, b, th, tw, co)
    # A^T along first axis
    p0 = [m[0, j] + m[1, j] + m[2, j] for j in range(4)]
    p1 = [m[1, j] - m[2, j] - m[3, j] for j in range(4)]
    y00 = p0[0] + p0[1] + p0[2]
    y01 = p0[1] - p0[2] - p0[3]
    y10 = p1[0] + p1[1] + p1[2]
    y11 = p1[1] - p1[2] - p1[3]
    y = jnp.stack(
        [jnp.stack([y00, y01], -1), jnp.stack([y10, y11], -1)], -2
    )  # [B, th, tw, Co, 2(h), 2(w)] -> fix axes
    # current: [B, th, tw, Co, 2, 2] with last two = (hsub, wsub)
    y = y.transpose(0, 1, 4, 2, 5, 3).reshape(b, th * 2, tw * 2, co)
    return y


def winograd_conv(x, g_t, bias):
    """x: [B, H, W, C] bf16; g_t: [16, C, Co] pre-transformed f32."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    v, meta = input_transform(xp)
    m = jax.lax.dot_general(
        v.astype(x.dtype),
        g_t.astype(x.dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [16, B*T, Co]
    y = output_transform(m, meta, g_t.shape[2])
    return (y + bias).astype(x.dtype)


def xla_conv(x, k, bias):
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + bias).astype(x.dtype)


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out.mean()))
    best = float("inf")
    for r in range(3):
        a2 = tuple(a * (1.0 + 1e-4 * (r + 1)) for a in args)
        t0 = time.perf_counter()
        float(jnp.float32(fn(*a2).mean()))
        best = min(best, time.perf_counter() - t0)
    return best / (ITERS * REPS)


def case(b, h, w, cin, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.bfloat16)
    k = (
        jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.float32)
        * 0.02
    )
    bias = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32) * 0.1
    kb = k.astype(jnp.bfloat16)
    u = winograd_weights(k)

    # numeric check (bf16 tolerance)
    yw = np.asarray(winograd_conv(x, u, bias), np.float32)
    yx = np.asarray(xla_conv(x, kb, bias), np.float32)
    err = np.abs(yw - yx).max() / (np.abs(yx).max() + 1e-6)
    scale = float(np.abs(yx).max())

    @jax.jit
    def loop_w(x0):
        def body(z, _):
            return winograd_conv(z, u, bias)[..., :cin] if cout != cin else winograd_conv(z, u, bias), None
        z, _ = jax.lax.scan(body, x0, None, length=REPS * ITERS)
        return z

    @jax.jit
    def loop_x(x0):
        def body(z, _):
            return xla_conv(z, kb, bias)[..., :cin] if cout != cin else xla_conv(z, kb, bias), None
        z, _ = jax.lax.scan(body, x0, None, length=REPS * ITERS)
        return z

    dt_w = timeit(loop_w, x * 0.01)
    dt_x = timeit(loop_x, x * 0.01)
    fl_direct = 2 * b * h * w * cin * cout * 9
    fl_wino = 2 * 16 * b * (h // 2) * (w // 2) * cin * cout
    print(
        f"B{b} {h}x{w} {cin}->{cout}: wino {dt_w*1e3:6.3f} ms "
        f"({fl_wino/dt_w/PEAK*100:4.1f}% of peak on wino-flops) | "
        f"xla {dt_x*1e3:6.3f} ms ({fl_direct/dt_x/PEAK*100:4.1f}% SOL) | "
        f"speedup {dt_x/dt_w:5.2f}x | relerr {err:.2e} (|y|max {scale:.1f})",
        flush=True,
    )


B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = 10 * max(1, 8 // B)
case(B, 64, 64, 320, 320)
case(B, 32, 32, 640, 640)
case(B, 16, 16, 1280, 1280)
case(B, 8, 8, 1280, 1280)
