"""Prompt algebra — the framework's namesake feature (host-side).

The reference's "complex prompt" layer (/root/reference/cpd/embeddings/)
re-designed for a jit-compiled pipeline: prompt objects stay host-side Python
and *compile down to* a fixed-shape :class:`~..guidance.GuidanceSpec` (stacked
factor embeddings, scales, masks), so the sampling loop never sees Python
objects.

Components:
  * tokenizer — CLIP BPE (vocab files) with a deterministic fallback
  * parse — "a cat:2.0 a dog:1.0" weighted-prompt syntax
  * masks — the programmatic spatial-mask DSL ("left_third_valid", ...)
  * interp — slerp/lerp/plerp/bleed embedding interpolation kernels
  * schedule — the lark grammar for "[a:b:0.5]" scheduled/alternating prompts
  * compose — ComplexPrompt / WeightedPrompt / CompositionalPrompt
  * transforms — embedding transform paths (LerpCLIP, sequences, configs)
"""

from complex_prompt_diffusion_tpu.prompts.tokenizer import (
    ClipBPETokenizer,
    HashTokenizer,
    get_tokenizer,
)
from complex_prompt_diffusion_tpu.prompts.parse import parse_weighted_prompt
from complex_prompt_diffusion_tpu.prompts.masks import make_mask
from complex_prompt_diffusion_tpu.prompts.interp import slerp, lerp, plerp, bleed
from complex_prompt_diffusion_tpu.prompts.schedule import (
    get_prompt_sequence,
    expand_schedule,
)
from complex_prompt_diffusion_tpu.prompts.compose import (
    ComplexPrompt,
    WeightedPrompt,
    CompositionalPrompt,
)

__all__ = [
    "ClipBPETokenizer",
    "HashTokenizer",
    "get_tokenizer",
    "parse_weighted_prompt",
    "make_mask",
    "slerp",
    "lerp",
    "plerp",
    "bleed",
    "get_prompt_sequence",
    "expand_schedule",
    "ComplexPrompt",
    "WeightedPrompt",
    "CompositionalPrompt",
]
