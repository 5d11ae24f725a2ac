"""CLIP text transformers (SD conditioning encoders), functional JAX.

Covers the reference's embedder zoo (/root/reference/cpd/models/embedder.py):
  * FrozenCLIPEmbedder (:794-837) — HF CLIP ViT-L/14 text tower (SD 1.x):
    12 layers, d=768, quick_gelu, ``layer`` in {last, pooled, hidden}.
  * FrozenOpenCLIPEmbedder (:840-899) — OpenCLIP ViT-H text tower (SD 2.x):
    24 layers, d=1024, gelu, ``layer`` = penultimate (stop 1 layer early).
  * FrozenCLIPTextEmbedder (:920-949) — the "guide" CLIP used for CLIP
    guidance: pooled embedding through text_projection, L2-normalized.

One implementation parameterized by :class:`CLIPTextConfig`. The text
transformer is causal; sequence length is fixed at 77, so attention runs as
a plain XLA matmul chain (a 77x77 score tile is VMEM-trivial; flash attention
buys nothing here).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu.models import layers as L

__all__ = ["CLIPTextConfig", "init_clip_text", "clip_text_apply"]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    mlp_ratio: int = 4
    activation: str = "quick_gelu"  # "quick_gelu" (CLIP-L) | "gelu" (OpenCLIP-H)
    projection_dim: Optional[int] = None  # text_projection for guide CLIP
    dtype: str = "float32"

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        """CLIP ViT-L/14 text tower (openai/clip-vit-large-patch14)."""
        return CLIPTextConfig()

    @staticmethod
    def sd21() -> "CLIPTextConfig":
        """OpenCLIP ViT-H/14 text tower (laion2b_s32b_b79k)."""
        return CLIPTextConfig(
            hidden_size=1024, num_layers=24, num_heads=16, activation="gelu"
        )

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4
        )

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def init_clip_text(key, cfg: CLIPTextConfig):
    d = cfg.hidden_size
    rng = L.as_np_rng(key)
    nk = lambda: rng  # noqa: E731
    import numpy as _np

    params = {
        "token_embedding": jnp.asarray(
            rng.normal(size=(cfg.vocab_size, d)) * 0.02, jnp.float32
        ),
        "position_embedding": jnp.asarray(
            rng.normal(size=(cfg.max_length, d)) * 0.01, jnp.float32
        ),
        "layers": [],
        "final_ln": L.init_layer_norm(d),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "ln1": L.init_layer_norm(d),
                "q": L.init_linear(nk(), d, d),
                "k": L.init_linear(nk(), d, d),
                "v": L.init_linear(nk(), d, d),
                "out": L.init_linear(nk(), d, d),
                "ln2": L.init_layer_norm(d),
                "fc1": L.init_linear(nk(), d, d * cfg.mlp_ratio),
                "fc2": L.init_linear(nk(), d * cfg.mlp_ratio, d),
            }
        )
    if cfg.projection_dim:
        params["text_projection"] = L.init_linear(
            nk(), d, cfg.projection_dim, bias=False
        )
    return params


def _act(cfg: CLIPTextConfig, x):
    if cfg.activation == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return L.gelu(x)


def _attn(p, x, heads: int, causal_bias):
    n, s, d = x.shape
    dh = d // heads

    def split(y):
        return y.reshape(n, s, heads, dh).transpose(0, 2, 1, 3)

    q = split(L.linear(p["q"], x))
    k = split(L.linear(p["k"], x))
    v = split(L.linear(p["v"], x))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (dh**-0.5)
    scores = scores + causal_bias
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(n, s, d)
    return L.linear(p["out"], out)


def clip_text_apply(
    cfg: CLIPTextConfig,
    params,
    tokens: jax.Array,
    *,
    layer: str = "last",
    layer_idx: Optional[int] = None,
):
    """Encode token ids [N, 77].

    ``layer``:
      * "last"        — final_ln(hidden_last)                  [N, 77, D]
      * "penultimate" — final_ln(hidden_{L-1}) (OpenCLIP SD2:
                        ln_final IS applied, embedder.py:885-892)
      * "hidden"      — raw hidden_{layer_idx}, NO final LN
                        (HF hidden_states semantics, embedder.py:833)
      * "pooled"      — EOT-token embedding, through text_projection if
                        configured, L2-normalized (guide CLIP,
                        embedder.py:940-948)                   [N, P]
    """
    n, s = tokens.shape
    dtype = cfg.compute_dtype
    x = params["token_embedding"][tokens].astype(dtype)
    x = x + params["position_embedding"][None, :s].astype(dtype)

    causal_bias = jnp.triu(
        jnp.full((s, s), -jnp.inf, jnp.float32), k=1
    )[None, None]

    if layer == "penultimate":
        stop = cfg.num_layers - 1
    elif layer == "hidden":
        if layer_idx is None:
            raise ValueError("layer='hidden' requires layer_idx")
        stop = layer_idx
    else:
        stop = cfg.num_layers

    for p in params["layers"][:stop]:
        x = x + _attn(p, L.layer_norm(p["ln1"], x), cfg.num_heads, causal_bias)
        h = L.linear(p["fc1"], L.layer_norm(p["ln2"], x))
        x = x + L.linear(p["fc2"], _act(cfg, h))

    if layer != "hidden":  # HF hidden_states are pre-final-LN
        x = L.layer_norm(params["final_ln"], x)

    if layer == "pooled":
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the highest token id
        pooled = x[jnp.arange(n), eot]
        if "text_projection" in params:
            pooled = L.linear(params["text_projection"], pooled)
        return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return x.astype(jnp.float32)
