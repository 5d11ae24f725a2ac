"""Does int8 dot_general actually run at 2x the bf16 MXU rate on this chip?

Feasibility probe for a quantized (W8A8) opt-in serving mode: times the
SD-shaped contractions (conv-as-matmul and FF shapes) in bf16 vs int8
(int32 accumulate). Whole jitted fori_loop, min-of-3 (docs/PERF.md
measurement rules).
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

N = 50


def bench_loop(step, x0, reps=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, N, lambda i, x: step(x), x)

    out = run(x0)
    float(jnp.asarray(out, jnp.float32).mean())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(out)
        float(jnp.asarray(out, jnp.float32).mean())
        ts.append(time.perf_counter() - t0)
    return min(ts) / N * 1e3


def main():
    key = jax.random.PRNGKey(0)
    # SD-shaped GEMMs at UNet batch 8: (M, K, N)
    shapes = [
        (8 * 4096, 320, 320),    # level-0 conv tap / projection
        (8 * 1024, 640, 640),    # level-1
        (8 * 256, 1280, 1280),   # level-2
        (8 * 4096, 320, 2560),   # level-0 FF proj
    ]
    for m, k_, n in shapes:
        flops = 2 * m * k_ * n
        xb = jax.random.normal(key, (m, k_), jnp.bfloat16)
        wb = jax.random.normal(jax.random.fold_in(key, 1), (k_, n), jnp.bfloat16)

        def step_bf16(x, w=wb):
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (y[:, : x.shape[1]] * 1e-3 + x.astype(jnp.float32) * 0.999
                    ).astype(jnp.bfloat16)

        ms_b = bench_loop(step_bf16, xb)

        xi = (jax.random.normal(key, (m, k_)) * 30).astype(jnp.int8)
        wi = (jax.random.normal(jax.random.fold_in(key, 1), (k_, n)) * 30
              ).astype(jnp.int8)

        def step_i8(x, w=wi):
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (y[:, : x.shape[1]] // 1024 + x.astype(jnp.int32)
                    ).astype(jnp.int8)

        ms_i = bench_loop(step_i8, xi)
        print(
            f"M{m} K{k_} N{n}: bf16 {ms_b:.3f} ms ({flops/ms_b/1e9:.0f} GF/s)"
            f" | int8 {ms_i:.3f} ms ({flops/ms_i/1e9:.0f} GOP/s)"
            f" | speedup {ms_b/ms_i:.2f}x"
        )


if __name__ == "__main__":
    main()
