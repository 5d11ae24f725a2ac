"""Test configuration: run every test on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this module
performs the setup at import time (pytest imports conftest before any test
module). Multi-chip sharding tests rely on the 8 virtual devices; Pallas
kernels run in interpret mode on CPU (handled inside the ops modules).
"""

import os

# FORCE the CPU backend. Env vars alone are NOT enough on this host: the
# TPU plugin is registered by a sitecustomize.py AT INTERPRETER BOOT
# (gated on PALLAS_AXON_POOL_IPS), which imports jax and latches
# JAX_PLATFORMS=axon into jax.config before pytest ever loads this
# conftest. Backends initialize lazily though, so forcing the platform
# through the CONFIG API (not the env var) before any device use still
# wins. (Rounds 1-2 shipped the env-var-only version: the suite "worked"
# but silently ran every test against the single real TPU through the
# tunnel — 1h40m.) The env vars are still set for subprocesses spawned
# by tests (multichip dryrun, tokenizer cross-checks).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable the TPU tunnel plugin
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402,F401

jax.config.update("jax_platforms", "cpu")

# This jax build's DEFAULT matmul precision demotes f32 matmuls (~1e-1 abs
# error at dim 128); pin full precision so numerics tests are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: XLA compiles are slow on this single-core
# box; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpd_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
