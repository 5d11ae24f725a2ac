"""Additional text encoders: T5 and a generic bidirectional transformer.

Parity targets in /root/reference/cpd/models/embedder.py:
  * FrozenT5Embedder (:764-792) — google/t5-v1_1 encoder: RMSNorm,
    relative-position-bucket attention bias (shared from layer 0), gated-GELU
    MLP, no attention scaling, no absolute positions.
  * BERTEmbedder / BERTTokenizer (:674-726) and the bundled x-transformers
    clone (TransformerWrapper/AttentionLayers/Attention, :196-617) — covered
    by :class:`TransformerTextConfig`: learned positional embeddings, pre-LN
    blocks, GELU MLP — the configuration the reference actually instantiates
    (emb_dropout/rel-pos flags off by default).
  * FrozenCLIPT5Encoder (:902-918) — concat of CLIP and T5 encodings.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from complex_prompt_diffusion_tpu.models import layers as L

__all__ = [
    "T5Config",
    "init_t5_encoder",
    "t5_encode",
    "convert_t5_hf",
    "TransformerTextConfig",
    "init_transformer_text",
    "transformer_text_apply",
    "clip_t5_encode",
]


# --------------------------------------------------------------------------
# T5 v1.1 encoder
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    num_heads: int = 16
    d_ff: int = 2816
    num_layers: int = 24
    relative_buckets: int = 32
    relative_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dtype: str = "float32"

    @staticmethod
    def v1_1_large() -> "T5Config":
        """google/t5-v1_1-large (the reference's default version,
        embedder.py:766)."""
        return T5Config()

    @staticmethod
    def tiny() -> "T5Config":
        return T5Config(
            vocab_size=1000, d_model=64, d_kv=16, num_heads=4, d_ff=128,
            num_layers=2,
        )


def _rms_norm(scale, x, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)


def relative_position_bucket(
    relative_position,
    num_buckets: int = 32,
    max_distance: int = 128,
    bidirectional: bool = True,
):
    """T5's relative position bucketing (host-side numpy)."""
    if bidirectional:
        num_buckets //= 2
        ret = (relative_position > 0).astype(np.int64) * num_buckets
        n = np.abs(relative_position)
    else:
        ret = np.zeros_like(relative_position, dtype=np.int64)
        n = np.maximum(-relative_position, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(n / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


def init_t5_encoder(key, cfg: T5Config, *, commit: bool = True):
    # host numpy leaves, one device_put at the end (see layers.init_conv)
    rng = L.as_np_rng(key)
    d = cfg.d_model
    inner = cfg.num_heads * cfg.d_kv
    params = {
        "token_embedding": rng.normal(
            size=(cfg.vocab_size, d)
        ).astype(np.float32),
        "relative_bias": (
            rng.normal(size=(cfg.relative_buckets, cfg.num_heads)) * 0.1
        ).astype(np.float32),
        "layers": [],
        "final_ln": np.ones((d,), np.float32),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "ln1": np.ones((d,), np.float32),
                "q": L.init_linear(rng, d, inner, bias=False),
                "k": L.init_linear(rng, d, inner, bias=False),
                "v": L.init_linear(rng, d, inner, bias=False),
                "o": L.init_linear(rng, inner, d, bias=False),
                "ln2": np.ones((d,), np.float32),
                "wi_0": L.init_linear(rng, d, cfg.d_ff, bias=False),
                "wi_1": L.init_linear(rng, d, cfg.d_ff, bias=False),
                "wo": L.init_linear(rng, cfg.d_ff, d, bias=False),
            }
        )
    return jax.device_put(params) if commit else params


def t5_encode(cfg: T5Config, params, tokens: jax.Array) -> jax.Array:
    """Encode token ids [N, L] -> [N, L, d_model] (last hidden state,
    embedder.py:783-791)."""
    n, s = tokens.shape
    dtype = jnp.dtype(cfg.dtype)
    x = params["token_embedding"][tokens].astype(dtype)

    pos = np.arange(s)
    rel = pos[None, :] - pos[:, None]  # memory - query
    buckets = relative_position_bucket(
        rel, cfg.relative_buckets, cfg.relative_max_distance
    )
    bias = params["relative_bias"][jnp.asarray(buckets)]  # [L, L, H]
    bias = jnp.transpose(bias, (2, 0, 1))[None]  # [1, H, L, L]

    h_heads, d_kv = cfg.num_heads, cfg.d_kv
    for p in params["layers"]:
        y = _rms_norm(p["ln1"], x, cfg.layer_norm_eps)

        def split(z):
            return z.reshape(n, s, h_heads, d_kv).transpose(0, 2, 1, 3)

        q = split(L.linear(p["q"], y))
        k = split(L.linear(p["k"], y))
        v = split(L.linear(p["v"], y))
        scores = (
            jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            + bias
        )  # T5: no 1/sqrt(d) scaling
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        att = att.transpose(0, 2, 1, 3).reshape(n, s, h_heads * d_kv)
        x = x + L.linear(p["o"], att)

        y = _rms_norm(p["ln2"], x, cfg.layer_norm_eps)
        gelu = L.gelu(L.linear(p["wi_0"], y))
        x = x + L.linear(p["wo"], gelu * L.linear(p["wi_1"], y))

    return _rms_norm(params["final_ln"], x, cfg.layer_norm_eps).astype(jnp.float32)


def convert_t5_hf(cfg: T5Config, sd, prefix: str = "encoder.") -> dict:
    """Map a HF T5EncoderModel state_dict onto the pytree."""
    params = {
        "token_embedding": sd.get("shared.weight", sd.get(f"{prefix}embed_tokens.weight")),
        "relative_bias": sd[
            f"{prefix}block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ],
        "layers": [],
        "final_ln": sd[f"{prefix}final_layer_norm.weight"],
    }
    for i in range(cfg.num_layers):
        b = f"{prefix}block.{i}.layer"
        params["layers"].append(
            {
                "ln1": sd[f"{b}.0.layer_norm.weight"],
                "q": {"kernel": sd[f"{b}.0.SelfAttention.q.weight"].T},
                "k": {"kernel": sd[f"{b}.0.SelfAttention.k.weight"].T},
                "v": {"kernel": sd[f"{b}.0.SelfAttention.v.weight"].T},
                "o": {"kernel": sd[f"{b}.0.SelfAttention.o.weight"].T},
                "ln2": sd[f"{b}.1.layer_norm.weight"],
                "wi_0": {"kernel": sd[f"{b}.1.DenseReluDense.wi_0.weight"].T},
                "wi_1": {"kernel": sd[f"{b}.1.DenseReluDense.wi_1.weight"].T},
                "wo": {"kernel": sd[f"{b}.1.DenseReluDense.wo.weight"].T},
            }
        )
    return params


# --------------------------------------------------------------------------
# Generic bidirectional transformer (BERTEmbedder / x-transformers slot)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TransformerTextConfig:
    """BERTEmbedder defaults (embedder.py:704-726): n_embed=1280, n_layer=32,
    vocab 30522, max_seq_len 77.

    The opt-in flags mirror the reference's x-transformers AttentionLayers
    surface (embedder.py:196-617): ``talking_heads`` (pre/post-softmax head
    mixing, :226-307,337), ``use_rmsnorm``/``use_scalenorm`` (:398-400),
    ``causal`` (:264-ish mask path), and the T5-style bucketed relative
    position bias the wrapper exposes as rel_pos (:362-390; the reference
    instance hardcodes rel_pos=None — here it actually works)."""

    vocab_size: int = 30522
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 8
    max_length: int = 77
    mlp_ratio: int = 4
    dtype: str = "float32"
    causal: bool = False
    talking_heads: bool = False
    use_rmsnorm: bool = False
    use_scalenorm: bool = False
    rel_pos_bias: bool = False
    rel_pos_num_buckets: int = 32
    rel_pos_max_distance: int = 128
    # residual-structure surface (AttentionLayers, embedder.py:366-466):
    # macaron prepends a Scale(0.5) FF to each block (:415-416, :446);
    # sandwich_coef front-loads attention and back-loads FF layers (:430);
    # gate_residual swaps the additive residual for a GRUCell gate
    # (:451-454, GRUGating :153-165); use_rezero drops the norms and
    # scales each attention branch by a zero-init learnable scalar
    # (:404-406, Rezero :117-125)
    macaron: bool = False
    sandwich_coef: int = 0
    gate_residual: bool = False
    use_rezero: bool = False

    @staticmethod
    def tiny(**kw) -> "TransformerTextConfig":
        return TransformerTextConfig(
            vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4, **kw
        )

    @property
    def layer_types(self):
        """('a'|'f', ...) execution plan (embedder.py:409-433)."""
        default = ("f", "a", "f") if self.macaron else ("a", "f")
        sc = self.sandwich_coef
        if sc:
            if not 0 < sc <= self.num_layers:
                raise ValueError(
                    "sandwich coefficient should be less than the depth"
                )
            return (
                ("a",) * sc
                + default * (self.num_layers - sc)
                + ("f",) * sc
            )
        return default * self.num_layers


def _init_norm(cfg, d):
    if cfg.use_scalenorm:
        return {"g": np.ones((1,), np.float32)}
    return L.init_layer_norm(d)  # rmsnorm reads only "scale"


def _apply_norm(cfg, p, x, eps=1e-5):
    if cfg.use_scalenorm:
        # ScaleNorm (embedder.py ScaleNorm): g * x / ||x||
        n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        return (x.astype(jnp.float32) / jnp.maximum(n, eps) * p["g"]).astype(
            x.dtype
        ) * (x.shape[-1] ** 0.5)
    if cfg.use_rmsnorm:
        return _rms_norm(p["scale"], x, eps)
    return L.layer_norm(p, x)


def _init_gru_gate(rng, d):
    """GRUCell params (GRUGating, embedder.py:153-165); torch GRUCell
    layout: weight_ih/hh stacked [3d, d] for (r, z, n) gates."""
    bound = 1.0 / np.sqrt(d)

    def u(shape):
        return rng.uniform(-bound, bound, shape).astype(np.float32)

    return {
        "w_ih": u((3 * d, d)),
        "w_hh": u((3 * d, d)),
        "b_ih": u((3 * d,)),
        "b_hh": u((3 * d,)),
    }


def init_transformer_text(key, cfg: TransformerTextConfig, *, commit: bool = True):
    rng = L.as_np_rng(key)
    d = cfg.hidden_size
    h = cfg.num_heads
    params = {
        "token_embedding": (rng.normal(size=(cfg.vocab_size, d)) * 0.02).astype(np.float32),
        "position_embedding": (rng.normal(size=(cfg.max_length, d)) * 0.01).astype(np.float32),
        "layers": [],
        "final_ln": _init_norm(cfg, d),
    }
    if cfg.rel_pos_bias:
        params["rel_pos_embedding"] = (
            rng.normal(size=(cfg.rel_pos_num_buckets, h)) * 0.02
        ).astype(np.float32)
    for kind in cfg.layer_types:
        if kind == "a":
            layer = {
                "ln": _init_norm(cfg, d),
                "q": L.init_linear(rng, d, d, bias=False),
                "k": L.init_linear(rng, d, d, bias=False),
                "v": L.init_linear(rng, d, d, bias=False),
                "out": L.init_linear(rng, d, d),
            }
            if cfg.talking_heads:
                layer["pre_softmax_proj"] = (
                    np.eye(h) + rng.normal(size=(h, h)) * 0.01
                ).astype(np.float32)
                layer["post_softmax_proj"] = (
                    np.eye(h) + rng.normal(size=(h, h)) * 0.01
                ).astype(np.float32)
            if cfg.use_rezero:
                # Rezero wraps only Attention branches (embedder.py:404-406)
                layer["rezero_g"] = np.zeros((1,), np.float32)
        else:
            layer = {
                "ln": _init_norm(cfg, d),
                "fc1": L.init_linear(rng, d, d * cfg.mlp_ratio),
                "fc2": L.init_linear(rng, d * cfg.mlp_ratio, d),
            }
        if cfg.gate_residual:
            layer["gru"] = _init_gru_gate(rng, d)
        params["layers"].append(layer)
    return jax.device_put(params) if commit else params


def transformer_text_apply(cfg: TransformerTextConfig, params, tokens):
    """Bidirectional encoder, returns [N, L, D] (TransformerWrapper with
    return_embeddings=True, embedder.py:717-726)."""
    n, s = tokens.shape
    dtype = jnp.dtype(cfg.dtype)
    x = params["token_embedding"][tokens].astype(dtype)
    x = x + params["position_embedding"][None, :s].astype(dtype)
    dh = cfg.hidden_size // cfg.num_heads

    rel_bias = None
    if cfg.rel_pos_bias:
        pos = np.arange(s)
        buckets = relative_position_bucket(
            pos[None, :] - pos[:, None],
            num_buckets=cfg.rel_pos_num_buckets,
            max_distance=cfg.rel_pos_max_distance,
            bidirectional=not cfg.causal,
        )
        # [s, s, h] -> [h, s, s]
        rel_bias = params["rel_pos_embedding"][buckets].transpose(2, 0, 1)

    causal_mask = None
    if cfg.causal:
        causal_mask = jnp.tril(jnp.ones((s, s), bool))

    def attn_branch(p, y):
        def split(z):
            return z.reshape(n, s, cfg.num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = split(L.linear(p["q"], y)), split(L.linear(p["k"], y)), split(L.linear(p["v"], y))
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (dh**-0.5)
        if "pre_softmax_proj" in p:
            # talking heads: mix attention logits across heads before
            # softmax (embedder.py:226-231,307)
            scores = jnp.einsum("bhqk,hg->bgqk", scores, p["pre_softmax_proj"])
        if rel_bias is not None:
            scores = scores + rel_bias[None]
        if causal_mask is not None:
            scores = jnp.where(causal_mask[None, None], scores, -1e9)
        w = jax.nn.softmax(scores, axis=-1)
        if "post_softmax_proj" in p:
            # ...and the probabilities after (embedder.py:337)
            w = jnp.einsum("bhqk,hg->bgqk", w, p["post_softmax_proj"])
        w = w.astype(v.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(n, s, -1)
        return L.linear(p["out"], att)

    def ff_branch(p, y):
        out = L.linear(p["fc2"], L.gelu(L.linear(p["fc1"], y)))
        # macaron FF layers are Scale(0.5)-wrapped (embedder.py:446)
        return out * 0.5 if cfg.macaron else out

    def residual_join(p, out, residual):
        if "gru" in p:
            # GRUGating (embedder.py:153-165): GRUCell(input=out,
            # hidden=residual); torch gate order (r, z, n)
            g = p["gru"]
            gi = jnp.dot(out, g["w_ih"].T) + g["b_ih"]
            gh = jnp.dot(residual, g["w_hh"].T) + g["b_hh"]
            i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            nq = jnp.tanh(i_n + r * h_n)
            return (1.0 - z) * nq + z * residual
        return out + residual

    for kind, p in zip(cfg.layer_types, params["layers"]):
        residual = x
        # use_rezero replaces the norms with identity (embedder.py:404)
        y = x if cfg.use_rezero else _apply_norm(cfg, p["ln"], x)
        if kind == "a":
            out = attn_branch(p, y)
            if "rezero_g" in p:
                out = out * p["rezero_g"]
        else:
            out = ff_branch(p, y)
        x = residual_join(p, out, residual)
    # the wrapper's final LayerNorm is unconditional (embedder.py:557,602)
    # — use_rezero only blanks the per-layer norms
    if cfg.use_rezero:
        return L.layer_norm(params["final_ln"], x).astype(jnp.float32)
    return _apply_norm(cfg, params["final_ln"], x).astype(jnp.float32)


def clip_t5_encode(clip_fn, t5_fn, text_tokens_clip, text_tokens_t5):
    """FrozenCLIPT5Encoder (embedder.py:902-918): both encodings as a list."""
    return [clip_fn(text_tokens_clip), t5_fn(text_tokens_t5)]
