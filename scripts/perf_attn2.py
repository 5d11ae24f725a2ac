import time, functools
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")
from complex_prompt_diffusion_tpu.ops.attention import flash_attention, _xla_attention

b, h, sq, skv, d = 2, 8, 4096, 4096, 40
keys = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(keys[0], (b, h, sq, d), jnp.bfloat16)
k = jax.random.normal(keys[1], (b, h, skv, d), jnp.bfloat16)
v = jax.random.normal(keys[2], (b, h, skv, d), jnp.bfloat16)
scale = 1.0 / (d ** 0.5)

pal = jax.jit(functools.partial(flash_attention, use_pallas=True, block_q=512, block_k=1024))
xla = jax.jit(functools.partial(_xla_attention, scale=scale))
o_p = pal(q, k, v).block_until_ready()
o_x = xla(q, k, v).block_until_ready()
print("correct:", np.abs(np.asarray(o_p, np.float32) - np.asarray(o_x, np.float32)).max())

for name, fn in [("pallas", pal), ("xla", xla)]:
    # fresh input each iter to defeat any caching; block every iter
    ts = []
    for i in range(10):
        qq = q + i * 1e-6
        fn(qq, k, v).block_until_ready()
        t0 = time.perf_counter()
        fn(qq, k, v).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(name, "min ms:", round(min(ts)*1e3, 3))
