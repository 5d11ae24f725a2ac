"""complex_prompt_diffusion_tpu — a TPU-native diffusion sampling framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``milesgray/complex_prompt_diffusion`` (see /root/repo/SURVEY.md): Stable
Diffusion 1.x/2.x txt2img / img2img / inpaint sampling with a composable
prompt algebra, a full sampler zoo, CLIP / attention-saliency guidance,
dynamic thresholding, depth conditioning and animation rendering.

Architecture stance (TPU-first, not a port):
  * pure functions + pytrees at the core; thin stateful API at the edge
  * schedulers = precomputed coefficient tables + pure ``step`` functions
  * samplers = ``lax.scan`` bodies, jit-compiled end to end
  * classifier-free guidance factors batched through ONE UNet call
  * flash attention + fused GroupNorm+SiLU as Pallas TPU kernels
  * parallelism via ``jax.sharding.Mesh`` + ``shard_map`` (no module offload)
"""

__version__ = "0.1.0"

from complex_prompt_diffusion_tpu import schedules  # noqa: F401
