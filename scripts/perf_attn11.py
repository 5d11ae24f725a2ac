"""Hybrid layouts: make both attention matmuls canonical bf16 MXU ops.

The sublane-contraction (transposed) matmul runs at f32 rate (~35-49 TF/s)
-- no native bf16 packing. Canonical bf16 K=128 runs at ~197 TF/s on padded
FLOPs, i.e. 61 TF/s useful at d=40: better. Variants (BH64 S4096 d40):

H1: q as [BH, 128, S] (sublane-padded transpose), k as [BH, S, 128]
    (lane-padded), v as [BH, 41, S] (transposed + ones row).
      s_t[bk,bq] = k[bk,128] @ q_t[128,bq]      (canonical bf16)
      softmax over sublanes (overlaps MXU)
      o_t[41,bq] = v_t[41,bk] @ p[bk,bq]        (canonical, thin M)
H2: q,k as [BH,S,128] with k ALSO as [BH,128,S]; v lane-padded [BH,S,128]
    with ones in column d.
      s[bq,bk] = q[bq,128] @ k_t[128,bk]        (canonical)
      softmax over lanes
      o[bq,128] = p[bq,bk] @ v[bk,128]          (canonical, thick M)
    output row-normal [bq, 128]; col d holds l.
Both also measured with the layout prep (transpose/pad) inside the jit.
"""
import functools
import math
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

REPS, ITERS = 10, 5
LOG2E = math.log2(math.e)


def _h1_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # [128, bq]
    k = k_ref[0]  # [bk, 128]
    s = jax.lax.dot_general(
        k, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, bq]
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp2(s - m).astype(v_ref.dtype)
    v = v_ref[0]  # [41, bk]
    o = jax.lax.dot_general(
        v, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [41, bq]
    d = o.shape[0] - 1
    o_ref[0] = (o[:d] / o[d:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def h1(q_t, k_n, v_t, *, block_q):
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


def _h2_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # [bq, 128]
    k = k_ref[0]  # [128, bk]
    s = jax.lax.dot_general(
        q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m).astype(v_ref.dtype)
    v = v_ref[0]  # [bk, 128] with ones in col d
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, 128]
    o_ref[0] = o.astype(o_ref.dtype)  # caller divides by col d


@functools.partial(jax.jit, static_argnames=("block_q",))
def h2(q_n, k_t, v_n, *, block_q):
    bh, s_len, _ = q_n.shape
    grid = (bh, s_len // block_q)
    return pl.pallas_call(
        _h2_kernel,
        out_shape=jax.ShapeDtypeStruct((bh, s_len, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 128, s_len), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s_len, 128), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(q_n, k_t, v_n)


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out[0].mean() if isinstance(out, tuple) else out.mean()))
    args = tuple(a * 1.0001 for a in args)
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.float32(out[0].mean() if isinstance(out, tuple) else out.mean()))
    return (time.perf_counter() - t0) / (ITERS * REPS) * 1e3


def ref_attn(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", jnp.float32(q), jnp.float32(k)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, jnp.float32(v))


def check(bh, s, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (bh, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (bh, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (bh, s, d), jnp.bfloat16)
    scale = d ** -0.5
    want = ref_attn(q, k, v, scale)

    # H1 prep
    q_t = jnp.pad(q.transpose(0, 2, 1) * (scale * LOG2E), ((0, 0), (0, 128 - d), (0, 0)))
    k_n = jnp.pad(k, ((0, 0), (0, 0), (0, 128 - d)))
    v_t = jnp.concatenate([v.transpose(0, 2, 1), jnp.ones((bh, 1, s), v.dtype)], 1)
    got1 = h1(q_t, k_n, v_t, block_q=min(512, s)).transpose(0, 2, 1)
    print(f"  H1 err: {float(jnp.max(jnp.abs(jnp.float32(got1) - want))):.4g}")

    # H2 prep
    q_n = jnp.pad(q * (scale * LOG2E), ((0, 0), (0, 0), (0, 128 - d)))
    k_t = jnp.pad(k.transpose(0, 2, 1), ((0, 0), (0, 128 - d), (0, 0)))
    v_n = jnp.pad(v, ((0, 0), (0, 0), (0, 128 - d)))
    v_n = v_n.at[:, :, d].set(1.0)
    o = h2(q_n, k_t, v_n, block_q=min(512, s))
    got2 = o[..., :d] / o[..., d:d + 1]
    print(f"  H2 err: {float(jnp.max(jnp.abs(jnp.float32(got2) - want))):.4g}")


def bench_h1(bh, s, d, bq, with_prep):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    scale = d ** -0.5
    if with_prep:
        q = jax.random.normal(ks[0], (bh, s, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (bh, s, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (bh, s, d), jnp.bfloat16)

        @jax.jit
        def run(q, k, v):
            def body(i, acc):
                def step(j, a):
                    q_t = jnp.pad(a.transpose(0, 2, 1) * (scale * LOG2E),
                                  ((0, 0), (0, 128 - d), (0, 0)))
                    k_n = jnp.pad(k, ((0, 0), (0, 0), (0, 128 - d)))
                    v_t = jnp.concatenate(
                        [v.transpose(0, 2, 1), jnp.ones((bh, 1, s), v.dtype)], 1)
                    o = h1(q_t, k_n, v_t, block_q=bq)
                    return o.transpose(0, 2, 1) * 0.999
                return jax.lax.fori_loop(0, REPS, step, acc)
            return jax.lax.fori_loop(0, ITERS, body, q)
        ms = timeit(run, q, k, v)
        tag = "H1+prep"
    else:
        q_t = jax.random.normal(ks[0], (bh, 128, s), jnp.bfloat16)
        k_n = jax.random.normal(ks[1], (bh, s, 128), jnp.bfloat16)
        v_t = jax.random.normal(ks[2], (bh, d + 1, s), jnp.bfloat16)

        @jax.jit
        def run(q_t, k_n, v_t):
            def body(i, acc):
                def step(j, a):
                    return h1(a, k_n, v_t, block_q=bq) and a * 0.999 or a
                return jax.lax.fori_loop(
                    0, REPS, lambda j, a: jnp.concatenate(
                        [h1(a, k_n, v_t, block_q=bq),
                         jnp.zeros((bh, 128 - d, s), a.dtype)], 1) * 0.999, acc)
            return jax.lax.fori_loop(0, ITERS, body, q_t)
        ms = timeit(run, q_t, k_n, v_t)
        tag = "H1"
    flops = 4 * bh * s * s * d
    print(f"{tag} BH{bh} S{s} d{d} bq{bq}: {ms:7.3f} ms ({flops/ms/1e9:6.1f} TF/s)")


def bench_h2(bh, s, d, bq, with_prep):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    scale = d ** -0.5
    if with_prep:
        q = jax.random.normal(ks[0], (bh, s, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (bh, s, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (bh, s, d), jnp.bfloat16)

        @jax.jit
        def run(q, k, v):
            def body(i, acc):
                def step(j, a):
                    q_n = jnp.pad(a * (scale * LOG2E), ((0, 0), (0, 0), (0, 128 - d)))
                    k_t = jnp.pad(k.transpose(0, 2, 1), ((0, 0), (0, 128 - d), (0, 0)))
                    v_n = jnp.pad(v, ((0, 0), (0, 0), (0, 128 - d)))
                    v_n = v_n.at[:, :, d].set(1.0)
                    o = h2(q_n, k_t, v_n, block_q=bq)
                    return (o[..., :d] / o[..., d:d + 1]).astype(a.dtype) * 0.999
                return jax.lax.fori_loop(0, REPS, step, acc)
            return jax.lax.fori_loop(0, ITERS, body, q)
        ms = timeit(run, q, k, v)
        tag = "H2+prep"
    else:
        q_n = jax.random.normal(ks[0], (bh, s, 128), jnp.bfloat16)
        k_t = jax.random.normal(ks[1], (bh, 128, s), jnp.bfloat16)
        v_n = jax.random.normal(ks[2], (bh, s, 128), jnp.bfloat16)

        @jax.jit
        def run(q_n, k_t, v_n):
            def body(i, acc):
                return jax.lax.fori_loop(
                    0, REPS,
                    lambda j, a: h2(a.astype(jnp.bfloat16), k_t, v_n, block_q=bq) * 0.999,
                    acc)
            return jax.lax.fori_loop(0, ITERS, body, q_n.astype(jnp.float32))
        ms = timeit(run, q_n, k_t, v_n)
        tag = "H2"
    flops = 4 * bh * s * s * d
    print(f"{tag} BH{bh} S{s} d{d} bq{bq}: {ms:7.3f} ms ({flops/ms/1e9:6.1f} TF/s)")


if __name__ == "__main__":
    print("== correctness BH4 S1024 ==")
    check(4, 1024, 40)
    check(4, 1024, 80)
    print("== level-0 BH64 S4096 d40 (best so far 3.40 / old 6.28) ==")
    for bq in (512, 1024, 2048):
        bench_h1(64, 4096, 40, bq, False)
    for bq in (512, 1024, 2048):
        bench_h2(64, 4096, 40, bq, False)
    bench_h1(64, 4096, 40, 1024, True)
    bench_h2(64, 4096, 40, 1024, True)
