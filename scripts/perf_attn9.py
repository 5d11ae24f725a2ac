"""One-pass transposed attention: whole KV row resident in VMEM.

At SD sequence lengths (<=4096) the full [S, bq] score block fits VMEM, so
online-softmax bookkeeping (running max/alpha rescale) is pure overhead.
Variants measured here, all on the [BH, D, S] transposed layout:
  V1: single KV block; f32 sum pass for the denominator; p cast to bf16.
  V2: V1 + denominator via a ones-row appended to V (the PV matmul computes
      l in its last output row -- removes the VPU sum pass; d 40->41 rounds
      into the same 48-sublane tile, zero extra MXU cost).
  V3: V2 + exp2 instead of exp (scale/max folded through log2 e).
Scale is folded into q outside the kernel in all variants.
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

REPS, ITERS = 10, 5
LOG2E = math.log2(math.e)


def _kernel_v1(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # [d, bq] (pre-scaled)
    k = k_ref[0]  # [d, S]
    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, bq]
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m).astype(v_ref.dtype)  # [S, bq] bf16
    l = jnp.sum(p.astype(jnp.float32), axis=0, keepdims=True)
    v = v_ref[0]  # [d, S]
    o = jax.lax.dot_general(
        v, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [d, bq]
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_v2(q_ref, k_ref, v_ref, o_ref, *, use_exp2):
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=0, keepdims=True)
    if use_exp2:
        p = jnp.exp2(s - m).astype(v_ref.dtype)
    else:
        p = jnp.exp(s - m).astype(v_ref.dtype)
    v = v_ref[0]  # [d+1, S]; last row is ones
    o = jax.lax.dot_general(
        v, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [d+1, bq]
    d = o.shape[0] - 1
    o_ref[0] = (o[:d] / o[d:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "variant"))
def onepass(q, k, v, *, scale, block_q, variant):
    bh, d, s_len = q.shape
    if variant == 3:
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    else:
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    if variant in (2, 3):
        ones = jnp.ones((bh, 1, s_len), v.dtype)
        v = jnp.concatenate([v, ones], axis=1)
        dv = d + 1
        kern = functools.partial(_kernel_v2, use_exp2=(variant == 3))
    else:
        dv = d
        kern = _kernel_v1
    grid = (bh, s_len // block_q)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bh, d, s_len), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, d, s_len), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, dv, s_len), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(q, k, v)


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.float32(out.mean()))
    args = tuple(a * 1.0001 for a in args)
    t0 = time.perf_counter()
    float(jnp.float32(fn(*args).mean()))
    return (time.perf_counter() - t0) / (ITERS * REPS) * 1e3


def make(bh, s, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (bh, d, s), jnp.bfloat16)
    k = jax.random.normal(ks[1], (bh, d, s), jnp.bfloat16)
    v = jax.random.normal(ks[2], (bh, d, s), jnp.bfloat16)
    return q, k, v


def check(bh, s, d, bq, variant):
    q, k, v = make(bh, s, d)
    scale = d ** -0.5
    o_t = onepass(q, k, v, scale=scale, block_q=bq, variant=variant)
    o_ref = flash_attention(
        q.transpose(0, 2, 1)[:, None], k.transpose(0, 2, 1)[:, None],
        v.transpose(0, 2, 1)[:, None], scale,
    )[:, 0].transpose(0, 2, 1)
    err = float(jnp.max(jnp.abs(jnp.float32(o_t) - jnp.float32(o_ref))))
    print(f"  V{variant} correctness BH{bh} S{s} d{d}: max|diff| = {err:.4g}")


def bench(bh, s, d, bq, variant):
    q, k, v = make(bh, s, d)
    scale = d ** -0.5

    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            def step(j, a):
                return onepass(a, k, v, scale=scale, block_q=bq, variant=variant) * 0.999
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, q)

    ms = timeit(run, q, k, v)
    flops = 4 * bh * s * s * d
    print(f"V{variant} BH{bh} S{s} d{d} bq{bq}: {ms:7.3f} ms ({flops/ms/1e9:6.1f} TF/s)")


if __name__ == "__main__":
    print("== correctness (BH4 S1024) ==")
    for vnt in (1, 2, 3):
        check(4, 1024, 40, 512, vnt)
        check(4, 1024, 80, 512, vnt)
    print("== level-0: BH64 S4096 d40 (current best 4.07, old 6.28) ==")
    for vnt in (1, 2, 3):
        for bq in (256, 512, 1024):
            bench(64, 4096, 40, bq, vnt)
    print("== level-1: BH64 S1024 d80 (best 0.835) ==")
    for vnt in (2, 3):
        for bq in (512, 1024):
            bench(64, 1024, 80, bq, vnt)
    print("== level-2: BH64 S256 d160 (best 0.653) ==")
    for vnt in (2, 3):
        bench(64, 256, 160, 256, vnt)
