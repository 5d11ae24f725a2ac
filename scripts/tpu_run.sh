#!/bin/bash
# Run a TPU job with wedge recovery: the tunneled backend hangs on first
# contact after idle; probe with short timeouts until it answers, then run.
export PYTHONPATH=/root/repo:/root/.axon_site
for i in $(seq 1 10); do
  if timeout 75 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert float(jnp.float32((x@x).mean())) == 256.0
print('probe ok')" 2>/dev/null | grep -q "probe ok"; then
    break
  fi
  echo "[tpu_run] probe $i hung, retrying" >&2
  sleep 5
done
exec "$@"
