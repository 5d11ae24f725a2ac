"""Ablate the one-pass transposed kernel: which op dominates?

Pieces at BH64 S4096 d40 bq1024 (whole-row KV):
  A: scores matmul only            s = k^T(d-contract) q
  B: A + max reduce
  C: B + exp (fused sub+exp+cast)
  D: full (C + PV matmul + div)    == perf_attn9 V3
  E: PV matmul only (p random)
  F: scores via f32 operands
  G: scores canonical-rhs form     s[bq,S] = q(d,bq)^T k(d,S)
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


def _mk(mode, dv):
    def kern(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]  # [d, bq]
        k = k_ref[0]  # [d, S]
        v = v_ref[0]  # [dv, S]
        d = q.shape[0]
        if mode == "G":
            s = jax.lax.dot_general(
                q, k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq, S]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)  # [bq, 1]
            o_ref[0] = jnp.broadcast_to(
                l.reshape(1, -1), o_ref[0].shape
            ).astype(o_ref.dtype)
            return
        if mode == "E":
            p = jnp.broadcast_to(q[:1, :], (k.shape[1], q.shape[1])).astype(v.dtype)
            o = jax.lax.dot_general(
                v, p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0] = o[:d].astype(o_ref.dtype)
            return
        kk = k.astype(jnp.float32) if mode == "F" else k
        qq = q.astype(jnp.float32) if mode == "F" else q
        s = jax.lax.dot_general(
            kk, qq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, bq]
        if mode in ("A", "F"):
            o_ref[0] = jnp.broadcast_to(s[:1, :], o_ref[0].shape).astype(o_ref.dtype)
            return
        m = jnp.max(s, axis=0, keepdims=True)
        if mode == "B":
            o_ref[0] = jnp.broadcast_to(m, o_ref[0].shape).astype(o_ref.dtype)
            return
        p = jnp.exp2(s - m).astype(v.dtype)
        if mode == "C":
            o_ref[0] = jnp.broadcast_to(p[:1, :], o_ref[0].shape).astype(o_ref.dtype)
            return
        o = jax.lax.dot_general(
            v, p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (o[:d] / o[d:]).astype(o_ref.dtype)

    return kern


@functools.partial(jax.jit, static_argnames=("block_q", "mode"))
def run_mode(q, k, v, *, block_q, mode):
    bh, d, s_len = q.shape
    dv = v.shape[1]
    grid = (bh, s_len // block_q)
    return pl.pallas_call(
        _mk(mode, dv),
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


def bench(bh, s, d, bq, mode):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (bh, d, s), jnp.bfloat16)
    k = jax.random.normal(ks[1], (bh, d, s), jnp.bfloat16)
    v = jax.random.normal(ks[2], (bh, d + 1, s), jnp.bfloat16)

    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            def step(j, a):
                return run_mode(a, k, v, block_q=bq, mode=mode) * 0.999
            return jax.lax.fori_loop(0, REPS, step, acc)
        return jax.lax.fori_loop(0, ITERS, body, q)

    ms = timeit(run, q, k, v)
    print(f"{mode} BH{bh} S{s} d{d} bq{bq}: {ms:7.3f} ms")


if __name__ == "__main__":
    for mode in ("A", "B", "C", "D", "E", "F", "G"):
        bench(64, 4096, 40, 1024, mode)
