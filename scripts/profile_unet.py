"""Capture a TPU trace of one UNet CFG call and print the top ops by
self-time (parses the tensorboard-profile plugin trace; the groundwork for
conv-path optimization, docs/PERF.md "next targets")."""
import glob
import gzip
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd")

from complex_prompt_diffusion_tpu import models as M

LOGDIR = "/tmp/cpd_trace"

cfg = M.UNetConfig.sd15()
params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                      M.init_unet(jax.random.PRNGKey(0), cfg))
f = jax.jit(lambda p, x, t, c: M.unet_apply(cfg, p, x, t, c))
x = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 4), jnp.float32)
t = jnp.ones((8,))
c = jax.random.normal(jax.random.PRNGKey(2), (8, 77, 768), jnp.float32)

float(jnp.float32(f(params, x, t, c).mean()))  # compile

jax.profiler.start_trace(LOGDIR)
for i in range(3):
    out = f(params, x * (1 + i * 1e-6), t, c)
float(jnp.float32(out.mean()))
jax.profiler.stop_trace()

# summarize trace events by name
files = glob.glob(f"{LOGDIR}/**/*.trace.json.gz", recursive=True)
if not files:
    print("no trace files under", LOGDIR, "- open with tensorboard instead")
else:
    with gzip.open(sorted(files)[-1], "rt") as fh:
        trace = json.load(fh)
    totals = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")[:60]
            totals[name] = totals.get(name, 0) + ev["dur"]
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
    print(f"{'us total':>12}  op")
    for name, dur in top:
        print(f"{dur:12.0f}  {name}")

# NOTE (round 1 finding): under the axon tunnel the profiler captures only
# host-side events — no device op breakdown. Device-level conv profiling
# needs a directly-attached TPU runtime (or XLA dump analysis:
# XLA_FLAGS=--xla_dump_to=... and inspect the compiled HLO schedule).
