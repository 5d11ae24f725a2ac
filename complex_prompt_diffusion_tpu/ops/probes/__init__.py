"""Quarantined kernel probes: real, tested kernels that are DISPATCHED
NOWHERE in the product paths (documented negative results — see
docs/PERF.md and scripts/README.md for the measurements that retired
them). Nothing in complex_prompt_diffusion_tpu imports from here; the
package exists so the evidence stays executable without a reader (or a
dispatch bug) mistaking these for shipped code paths.

Contents:
  winograd.py — F(2x2,3x3) Winograd conv (PERF.md "Round 3: Winograd
    F(2x2,3x3) conv (negative result)": transform overhead eats the tap
    savings on the MXU; never dispatched).
"""
