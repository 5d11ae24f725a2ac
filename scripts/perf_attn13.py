"""Batch-8 attention regression probe: one-pass (whole-KV-resident) vs
streaming (block_k-chunked) kernels at BH=128, S=4096, d=40 — the level-0
self-attention shape where b8 scales 2.21x instead of 2.0x (docs/PERF.md).
Whole jitted fori_loop, min-of-3.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu.ops.attention import flash_attention

N = 30


def bench_loop(step, x0, reps=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, N, lambda i, x: step(x), x)

    out = run(x0)
    float(out.mean())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(out)
        float(out.mean())
        ts.append(time.perf_counter() - t0)
    return min(ts) / N * 1e3


def main():
    key = jax.random.PRNGKey(0)
    for bh in (64, 128):
        b, h, s, d = bh // 8, 8, 4096, 40
        q0 = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)

        def mk(block_q, block_k):
            def step(q):
                o = flash_attention(
                    q, q, q, block_q=block_q, block_k=block_k
                )
                return o * 0.999 + q * 0.001

            return step

        base = bench_loop(mk(None, None), q0)
        print(f"BH={bh} one-pass default: {base:.3f} ms")
        for bq, bk in ((512, 1024), (512, 2048), (1024, 1024),
                       (512, 4096), (1024, 2048), (256, 1024)):
            ms = bench_loop(mk(bq, bk), q0)
            print(f"BH={bh} streaming q{bq} k{bk}: {ms:.3f} ms"
                  f" ({base / ms:.2f}x)")


if __name__ == "__main__":
    main()
