#!/bin/bash
# Run a TPU job with wedge recovery: the tunneled backend hangs on first
# contact after idle; probe until it answers, then exec the real job.
#
# Probe discipline (docs/PERF.md "never kill one mid-RPC"): a probe that is
# merely SLOW (cold compile on this 1-core host) must not be killed while
# holding the device — that wedges the backend for 20-30 min, the exact
# failure this script recovers from. So the probe (a) uses the persistent
# compile cache (warm probe compiles are sub-second) and (b) gets a timeout
# far above worst-case cold-compile (~40 s measured). A probe hung in
# futex_wait never acquired the device, so killing it is safe.
export PYTHONPATH="/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
ok=0
for i in $(seq 1 12); do
  if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_cpd')
import jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert float(jnp.float32((x@x).mean())) == 256.0
print('probe ok')" 2>/dev/null | grep -q "probe ok"; then
    ok=1
    break
  fi
  echo "[tpu_run] probe $i hung, retrying" >&2
  sleep 5
done
if [ "$ok" != 1 ]; then
  echo "[tpu_run] backend unresponsive after 12 probes; refusing to run" >&2
  exit 75  # EX_TEMPFAIL
fi
exec "$@"
