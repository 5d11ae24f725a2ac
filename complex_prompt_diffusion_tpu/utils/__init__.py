"""Foundation utilities: seeding, attr-dict, image IO, embedding metrics.

Parity targets: /root/reference/cpd/util.py (seed_everything :467, Map
:427, image/latent helpers :222-397) and /root/reference/cpd/metrics.py:6-21.

Deliberately NOT carried over: ``get_obj_from_str`` / ``from_json`` dynamic
dotted-path import (util.py:521-538) — JSON deserialization goes through
explicit class registries (prompts.compose.PROMPT_REGISTRY) instead; and the
entire vram.py CPU<->GPU offload engine (weights are HBM-resident).
"""

from complex_prompt_diffusion_tpu.utils.misc import Map, seed_everything
from complex_prompt_diffusion_tpu.utils.image import (
    load_image,
    save_image,
    image_to_array,
    array_to_image,
)
from complex_prompt_diffusion_tpu.utils.metrics import (
    spherical_dist,
    euclidean_dist,
    cosine_sim,
)

__all__ = [
    "Map",
    "seed_everything",
    "load_image",
    "save_image",
    "image_to_array",
    "array_to_image",
    "spherical_dist",
    "euclidean_dist",
    "cosine_sim",
]
