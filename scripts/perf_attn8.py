"""Prototype: transposed-layout flash attention for small head_dim.

SD-1.5 level-0 self-attention (S=4096, d=40, 8 heads) wastes 3.2x nominal
FLOPs in the current kernel because d is padded 40->128 on the *lane* dim
(both the QK contraction and the PV output). Idea: keep q/k/v as [BH, D, S]
so d sits on SUBLANES (granularity 8 f32 / 16 bf16):
  s_t [bk, bq] = dot_general(k_t [d,bk], q_t [d,bq], contract dim0/dim0)
  p_t = online-softmax over axis 0 (sublanes)
  o_t [d, bq] = dot_general(v_t [d,bk], p_t [bk,bq], contract (1,)/(0,))  # canonical
Measure vs the current kernel at bench shapes.
"""
import functools
import math
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu.ops.attention import flash_attention

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
REPS, ITERS = 10, 5


def _kernel_t(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, scale, kv_len, block_k, num_kv_blocks,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0]  # [d, bq]
    k = k_ref[0]  # [d, bk]
    # scores transposed: [bk, bq]
    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    if num_kv_blocks * block_k > kv_len:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * block_k
        s = jnp.where(row < kv_len, s, _NEG_INF)

    m_prev = m_scr[:1, :]  # [1, bq]
    l_prev = l_scr[:1, :]
    m_curr = jnp.max(s, axis=0, keepdims=True)  # [1, bq]
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)  # [bk, bq]
    l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)

    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

    v = v_ref[0]  # [d, bk]
    pv = jax.lax.dot_general(
        v, p.astype(v.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [d, bq]
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(j == num_kv_blocks - 1)
    def _store():
        l_final = l_scr[:1, :]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_t(q, k, v, *, scale, block_q, block_k):
    """q: [BH, D, Sq]; k, v: [BH, D, Skv]."""
    bh, d, sq = q.shape
    kv_len = k.shape[2]
    num_kv_blocks = (kv_len + block_k - 1) // block_k
    skv_pad = num_kv_blocks * block_k
    if skv_pad != kv_len:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - kv_len)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - kv_len)))
    grid = (bh, sq // block_q, num_kv_blocks)
    return pl.pallas_call(
        functools.partial(
            _kernel_t, scale=scale, kv_len=kv_len, block_k=block_k,
            num_kv_blocks=num_kv_blocks,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, d, sq), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, d, block_k), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, d, block_k), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v)


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out.mean()))
    args = tuple(a * 1.0001 for a in args)
    t0 = time.perf_counter()
    float(jnp.float32(fn(*args).mean()))
    return (time.perf_counter() - t0) / (ITERS * REPS) * 1e3


def check(bh, s, d, bq, bk):
    kq = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq[0], (bh, d, s), jnp.bfloat16)
    k = jax.random.normal(kq[1], (bh, d, s), jnp.bfloat16)
    v = jax.random.normal(kq[2], (bh, d, s), jnp.bfloat16)
    scale = d ** -0.5
    o_t = flash_t(q, k, v, scale=scale, block_q=bq, block_k=bk)
    # reference via existing kernel ([B,H,S,D])
    o_ref = flash_attention(
        q.transpose(0, 2, 1)[:, None], k.transpose(0, 2, 1)[:, None],
        v.transpose(0, 2, 1)[:, None], scale,
    )[:, 0].transpose(0, 2, 1)
    err = float(jnp.max(jnp.abs(jnp.float32(o_t) - jnp.float32(o_ref))))
    print(f"  correctness BH{bh} S{s} d{d}: max|diff| = {err:.4g}")


def bench_t(bh, s, d, bq, bk):
    kq = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq[0], (bh, d, s), jnp.bfloat16)
    k = jax.random.normal(kq[1], (bh, d, s), jnp.bfloat16)
    v = jax.random.normal(kq[2], (bh, d, s), jnp.bfloat16)
    scale = d ** -0.5

    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            def step(j, a):
                return flash_t(a, k, v, scale=scale, block_q=bq, block_k=bk) * 0.999
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, q)

    ms = timeit(run, q, k, v)
    flops = 4 * bh * s * s * d
    print(f"T-kernel BH{bh} S{s} d{d} blocks {bq}x{bk}: {ms:7.3f} ms "
          f"({flops/ms/1e9:6.1f} TF/s)")


def bench_cur(bh, s, d, bq, bk):
    kq = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq[0], (bh, 1, s, d), jnp.bfloat16)
    k = jax.random.normal(kq[1], (bh, 1, s, d), jnp.bfloat16)
    v = jax.random.normal(kq[2], (bh, 1, s, d), jnp.bfloat16)
    scale = d ** -0.5

    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            def step(j, a):
                return flash_attention(a, k, v, scale, block_q=bq, block_k=bk) * 0.999
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, q)

    ms = timeit(run, q, k, v)
    flops = 4 * bh * s * s * d
    print(f"current  BH{bh} S{s} d{d} blocks {bq}x{bk}: {ms:7.3f} ms "
          f"({flops/ms/1e9:6.1f} TF/s)")


if __name__ == "__main__":
    print("== correctness ==")
    check(4, 1024, 40, 512, 512)
    check(4, 1024, 80, 512, 512)
    print("== level-0: BH64 S4096 d40 ==")
    bench_cur(64, 4096, 40, 512, 4096)
    for bq, bk in ((512, 4096), (512, 2048), (1024, 2048), (256, 4096),
                   (512, 1024), (1024, 4096), (2048, 4096)):
        bench_t(64, 4096, 40, bq, bk)
    print("== level-1: BH64 S1024 d80 ==")
    bench_cur(64, 1024, 80, 512, 1024)
    for bq, bk in ((512, 1024), (1024, 1024), (256, 1024)):
        bench_t(64, 1024, 80, bq, bk)
    print("== level-2: BH64 S256 d160 ==")
    bench_cur(64, 256, 160, 256, 1024)
    for bq, bk in ((256, 256), (128, 256)):
        bench_t(64, 256, 160, bq, bk)
