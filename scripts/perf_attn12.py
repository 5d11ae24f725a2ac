"""End-to-end wrapper comparison at the UNet interface.

All candidates take q,k,v as [B, S, H*D] (post-projection layout) and return
[B, S, H*D], so every transpose/pad is inside the timed region.
  cur : existing flash_attention path
  v3  : one-pass transposed kernel ([BH,D,S], exp2, ones-row denominator)
  h1  : canonical-bf16 QK ([bk,128]@[128,bq]) + transposed PV
Plus clean QK-only ablations for v3/h1 forms.
"""
import functools
import math
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu.ops.attention import attention as cur_attention

REPS, ITERS = 10, 5
LOG2E = math.log2(math.e)


# ---------- V3 kernel ----------
def _v3_kernel(q_ref, k_ref, v_ref, o_ref, *, f32_scores):
    q = q_ref[0]  # [d, bq] pre-scaled by scale*log2e
    k = k_ref[0]  # [d, S]
    if f32_scores:
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, bq]
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp2(s - m).astype(v_ref.dtype)
    v = v_ref[0]  # [d+1, S] with ones row
    o = jax.lax.dot_general(
        v, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    d = o.shape[0] - 1
    o_ref[0] = (o[:d] / o[d:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "f32_scores"))
def v3_call(q_t, k_t, v_t, *, block_q, f32_scores):
    bh, d, s_len = q_t.shape
    grid = (bh, s_len // block_q)
    return pl.pallas_call(
        functools.partial(_v3_kernel, f32_scores=f32_scores),
        out_shape=jax.ShapeDtypeStruct((bh, d, s_len), q_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, d, s_len), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, d + 1, s_len), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(q_t, k_t, v_t)


def v3_attention(q, k, v, h, scale, block_q=1024, f32_scores=False):
    b, s, hd = q.shape
    d = hd // h

    def t(x):  # [B,S,H*D] -> [BH, d, S]
        return x.reshape(b, s, h, d).transpose(0, 2, 3, 1).reshape(b * h, d, s)

    q_t = t(q) * jnp.asarray(scale * LOG2E, q.dtype)
    k_t = t(k)
    v_t = jnp.concatenate(
        [t(v), jnp.ones((b * h, 1, s), v.dtype)], axis=1)
    o_t = v3_call(q_t, k_t, v_t, block_q=min(block_q, s), f32_scores=f32_scores)
    return o_t.reshape(b, h, d, s).transpose(0, 3, 1, 2).reshape(b, s, hd)


# ---------- H1 kernel (canonical bf16 QK) ----------
def _h1_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # [128, bq]
    k = k_ref[0]  # [S, 128]
    s = jax.lax.dot_general(
        k, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, bq]
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp2(s - m).astype(v_ref.dtype)
    v = v_ref[0]  # [d+1, S]
    o = jax.lax.dot_general(
        v, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    d = o.shape[0] - 1
    o_ref[0] = (o[:d] / o[d:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def h1_call(q_t, k_n, v_t, *, block_q):
    bh, _, s_len = q_t.shape
    d = v_t.shape[1] - 1
    grid = (bh, s_len // block_q)
    return pl.pallas_call(
        _h1_kernel,
        out_shape=jax.ShapeDtypeStruct((bh, d, s_len), q_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, s_len, 128), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, d + 1, s_len), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(q_t, k_n, v_t)


def h1_attention(q, k, v, h, scale, block_q=1024):
    b, s, hd = q.shape
    d = hd // h

    def t(x):
        return x.reshape(b, s, h, d).transpose(0, 2, 3, 1).reshape(b * h, d, s)

    q_t = t(q) * jnp.asarray(scale * LOG2E, q.dtype)
    q_t = jnp.pad(q_t, ((0, 0), (0, 128 - d), (0, 0)))
    k_n = jnp.pad(
        k.reshape(b, s, h, d).transpose(0, 2, 1, 3).reshape(b * h, s, d),
        ((0, 0), (0, 0), (0, 128 - d)))
    v_t = jnp.concatenate([t(v), jnp.ones((b * h, 1, s), v.dtype)], axis=1)
    o_t = h1_call(q_t, k_n, v_t, block_q=min(block_q, s))
    return o_t.reshape(b, h, d, s).transpose(0, 3, 1, 2).reshape(b, s, hd)


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out.mean()))
    args = tuple(a * 1.0001 for a in args)
    t0 = time.perf_counter()
    float(jnp.float32(fn(*args).mean()))
    return (time.perf_counter() - t0) / (ITERS * REPS) * 1e3


def bench_wrapper(name, attn_fn, b, h, s, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h * d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h * d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h * d), jnp.bfloat16)
    scale = d ** -0.5

    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            def step(j, a):
                return attn_fn(a, k, v, h, scale) * 0.999
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, q)

    ms = timeit(run, q, k, v)
    flops = 4 * b * h * s * s * d
    print(f"{name:22s} B{b} H{h} S{s} d{d}: {ms:7.3f} ms ({flops/ms/1e9:6.1f} TF/s)")


def check_wrapper(name, attn_fn, b, h, s, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h * d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h * d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h * d), jnp.bfloat16)
    scale = d ** -0.5
    want = cur_attention(q, k, v, h, scale)
    got = attn_fn(q, k, v, h, scale)
    err = float(jnp.max(jnp.abs(jnp.float32(got) - jnp.float32(want))))
    print(f"  {name} err vs current: {err:.4g}")


if __name__ == "__main__":
    print("== correctness (B2 H8 S1024) ==")
    check_wrapper("v3", v3_attention, 2, 8, 1024, 40)
    check_wrapper("v3-f32", functools.partial(v3_attention, f32_scores=True), 2, 8, 1024, 40)
    check_wrapper("h1", h1_attention, 2, 8, 1024, 40)
    print("== level-0 end-to-end: B8 H8 S4096 d40 ==")
    bench_wrapper("current", cur_attention, 8, 8, 4096, 40)
    bench_wrapper("v3 bq1024", v3_attention, 8, 8, 4096, 40)
    bench_wrapper("v3 bq2048", functools.partial(v3_attention, block_q=2048), 8, 8, 4096, 40)
    bench_wrapper("v3-f32 bq1024", functools.partial(v3_attention, f32_scores=True), 8, 8, 4096, 40)
    bench_wrapper("h1 bq1024", h1_attention, 8, 8, 4096, 40)
    bench_wrapper("h1 bq2048", functools.partial(h1_attention, block_q=2048), 8, 8, 4096, 40)
    print("== level-1 end-to-end: B8 H8 S1024 d80 ==")
    bench_wrapper("current", cur_attention, 8, 8, 1024, 80)
    bench_wrapper("v3 bq1024", v3_attention, 8, 8, 1024, 80)
    bench_wrapper("h1 bq1024", h1_attention, 8, 8, 1024, 80)
    print("== level-2 end-to-end: B8 H8 S256 d160 ==")
    bench_wrapper("current", cur_attention, 8, 8, 256, 160)
    bench_wrapper("v3", functools.partial(v3_attention, block_q=256), 8, 8, 256, 160)
    print("== batch-1 (B2 H8 S4096 d40) ==")
    bench_wrapper("current", cur_attention, 2, 8, 4096, 40)
    bench_wrapper("v3 bq1024", v3_attention, 2, 8, 4096, 40)
