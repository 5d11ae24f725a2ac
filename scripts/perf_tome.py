"""A/B the ToMe token-merge machinery (ops/tome.py) on the real chip.

Per-dispatch overhead on this backend is ~25 ms (docs/PERF.md
"Measurement warning"), so every number here comes from a whole jitted
fori_loop over N iterations — the only trustworthy method.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu.ops import tome as T
from complex_prompt_diffusion_tpu.ops import attention as A

N = 50


def bench_loop(step, x0, reps=3):
    """step: x -> x (same shape). Times N chained applications."""

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
    b, s, c = 2, 4096, 320
    h = w = 64
    r = 2048
    x0 = jax.random.normal(key, (b, s, c), jnp.bfloat16)

    # 1. full roundtrip: build + merge + unmerge (output same shape as input)
    def roundtrip(x):
        plan = T.build_merge(x, h, w, r, 2, 2)
        y = T.tome_merge(plan, x)
        return T.tome_unmerge(plan, y) * 0.999

    print(f"build+merge+unmerge: {bench_loop(roundtrip, x0):.3f} ms")

    # 2. build only (fold idx_src back in to keep the loop data-dependent)
    def build_only(x):
        plan = T.build_merge(x, h, w, r, 2, 2)
        return x * 0.999 + (jnp.sum(plan.idx_src) * 1e-12).astype(x.dtype)

    print(f"build_merge only:    {bench_loop(build_only, x0):.3f} ms")

    # 3. build without the argsorts (scores+argmax only)
    def scores_only(x):
        mn = x / (
            jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
            + 1e-6
        ).astype(x.dtype)
        m_src = jnp.take(mn, jnp.arange(3072), axis=1)
        m_dst = jnp.take(mn, jnp.arange(1024), axis=1)
        sc = jax.lax.dot_general(
            m_src, m_dst, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        node_max = jnp.max(sc, axis=-1)
        node_idx = jnp.argmax(sc, axis=-1)
        return x * 0.999 + ((jnp.sum(node_max) + jnp.sum(node_idx)) * 1e-12).astype(x.dtype)

    print(f"scores+argmax only:  {bench_loop(scores_only, x0):.3f} ms")

    # 4. one argsort of [B, 3072]
    def argsort_only(x):
        v = jnp.sum(x.astype(jnp.float32), axis=-1)[:, :3072]  # [B, 3072]
        o = jnp.argsort(-v, axis=-1)
        return x * 0.999 + (jnp.sum(o) * 1e-12).astype(x.dtype)

    print(f"one argsort [2,3072]: {bench_loop(argsort_only, x0):.3f} ms")

    # 5. reference: self-attention at S=4096 vs S=2048 (what ToMe saves),
    # one-pass transposed kernel, 8 heads x d=40 as at level 0
    def attn_at(s_):
        q0 = jax.random.normal(key, (b, s_, c), jnp.bfloat16)

        def step(q):
            o = A.attention(q, q, q, num_heads=8)
            return o * 0.999 + q * 0.001

        return bench_loop(step, q0)

    print(f"self-attn S=4096:    {attn_at(4096):.3f} ms")
    print(f"self-attn S=2048:    {attn_at(2048):.3f} ms")


if __name__ == "__main__":
    main()
