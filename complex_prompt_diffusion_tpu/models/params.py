"""Checkpoint loading: torch / safetensors state_dicts -> JAX param pytrees.

Handles the CompVis single-file SD checkpoint layout the reference manager
loads (/root/reference/cpd/manager.py:18-23):
  * ``model.diffusion_model.*``        -> UNet
  * ``first_stage_model.*``            -> VAE (AutoencoderKL)
  * ``cond_stage_model.transformer.*`` -> HF CLIP text (SD 1.x)
  * ``cond_stage_model.model.*``       -> OpenCLIP text (SD 2.x)

Conversions: conv OIHW -> HWIO, linear [out,in] -> [in,out], norm
weight/bias -> scale/bias. OpenCLIP's packed ``attn.in_proj_weight`` is split
into q/k/v. All arrays are loaded as f32 numpy; casting to compute dtype
happens at apply time.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from complex_prompt_diffusion_tpu.models.clip import CLIPTextConfig
from complex_prompt_diffusion_tpu.models.unet import UNetConfig, build_plan
from complex_prompt_diffusion_tpu.models.vae import VAEConfig

__all__ = [
    "load_state_dict",
    "convert_unet",
    "convert_unet_diffusers",
    "diffusers_to_compvis_unet",
    "convert_vae",
    "convert_clip_hf",
    "convert_clip_openclip",
    "convert_clip_vision_hf",
    "load_sd_checkpoint",
    "attach_hypernetwork",
    "make_it_fit",
    "zero_extend_input_conv",
]

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_state_dict(path: str) -> Dict[str, Array]:
    """Read a torch .ckpt/.pt (pickle) or .safetensors file into numpy f32."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        raw = load_file(path)
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        raw = {k: v.float().numpy() for k, v in obj.items() if hasattr(v, "numpy")}
    return {k: np.asarray(v, dtype=np.float32) for k, v in raw.items()}


def _conv(sd: StateDict, prefix: str) -> Dict[str, Array]:
    w = sd[prefix + ".weight"]
    return {
        "kernel": np.transpose(w, (2, 3, 1, 0)),  # OIHW -> HWIO
        "bias": sd[prefix + ".bias"],
    }


def _linear(sd: StateDict, prefix: str, bias: bool = True) -> Dict[str, Array]:
    p = {"kernel": sd[prefix + ".weight"].T}
    if bias:
        p["bias"] = sd[prefix + ".bias"]
    return p


def _norm(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


# --------------------------------------------------------------------------
# UNet (CompVis model.diffusion_model.* layout)
# --------------------------------------------------------------------------


def _convert_res(sd: StateDict, p: str) -> Dict[str, Any]:
    out = {
        "in_norm": _norm(sd, f"{p}.in_layers.0"),
        "in_conv": _conv(sd, f"{p}.in_layers.2"),
        "emb": _linear(sd, f"{p}.emb_layers.1"),
        "out_norm": _norm(sd, f"{p}.out_layers.0"),
        "out_conv": _conv(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{p}.skip_connection")
    return out


def _convert_spatial_transformer(
    sd: StateDict, p: str, depth: int, use_linear: bool
) -> Dict[str, Any]:
    if use_linear:
        proj_in = _linear(sd, f"{p}.proj_in")
        proj_out = _linear(sd, f"{p}.proj_out")
    else:
        proj_in = _conv(sd, f"{p}.proj_in")
        proj_out = _conv(sd, f"{p}.proj_out")
    blocks = []
    for d in range(depth):
        b = f"{p}.transformer_blocks.{d}"
        blocks.append(
            {
                "norm1": _norm(sd, f"{b}.norm1"),
                "attn1": {
                    "to_q": _linear(sd, f"{b}.attn1.to_q", bias=False),
                    "to_k": _linear(sd, f"{b}.attn1.to_k", bias=False),
                    "to_v": _linear(sd, f"{b}.attn1.to_v", bias=False),
                    "to_out": _linear(sd, f"{b}.attn1.to_out.0"),
                },
                "norm2": _norm(sd, f"{b}.norm2"),
                "attn2": {
                    "to_q": _linear(sd, f"{b}.attn2.to_q", bias=False),
                    "to_k": _linear(sd, f"{b}.attn2.to_k", bias=False),
                    "to_v": _linear(sd, f"{b}.attn2.to_v", bias=False),
                    "to_out": _linear(sd, f"{b}.attn2.to_out.0"),
                },
                "norm3": _norm(sd, f"{b}.norm3"),
                "ff": {
                    "proj": _linear(sd, f"{b}.ff.net.0.proj"),
                    "out": _linear(sd, f"{b}.ff.net.2"),
                },
            }
        )
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": proj_in,
        "proj_out": proj_out,
        "blocks": blocks,
    }


def convert_unet(
    cfg: UNetConfig, sd: StateDict, prefix: str = "model.diffusion_model."
) -> Dict[str, Any]:
    """Map CompVis UNet keys (unet.py:531-739 module tree) onto the plan."""
    input_plan, middle_plan, output_plan = build_plan(cfg)

    def convert_sublayer(desc, p: str):
        kind = desc[0]
        if kind in ("conv_in", "down", "up"):
            if kind == "down":
                return _conv(sd, f"{p}.op")
            if kind == "up":
                return _conv(sd, f"{p}.conv")
            return _conv(sd, p)
        if kind == "res":
            return _convert_res(sd, p)
        if kind == "attn":
            return _convert_spatial_transformer(
                sd, p, desc[4], cfg.use_linear_in_transformer
            )
        raise ValueError(kind)

    params: Dict[str, Any] = {
        "time_embed": {
            "lin1": _linear(sd, f"{prefix}time_embed.0"),
            "lin2": _linear(sd, f"{prefix}time_embed.2"),
        },
        "input_blocks": [
            [
                convert_sublayer(desc, f"{prefix}input_blocks.{i}.{j}")
                for j, desc in enumerate(block)
            ]
            for i, block in enumerate(input_plan)
        ],
        "middle_block": [
            convert_sublayer(desc, f"{prefix}middle_block.{j}")
            for j, desc in enumerate(middle_plan)
        ],
        "output_blocks": [
            [
                convert_sublayer(desc, f"{prefix}output_blocks.{i}.{j}")
                for j, desc in enumerate(block)
            ]
            for i, block in enumerate(output_plan)
        ],
        "out": {
            "norm": _norm(sd, f"{prefix}out.0"),
            "conv": _conv(sd, f"{prefix}out.2"),
        },
    }
    if cfg.num_classes and f"{prefix}label_emb.weight" in sd:
        params["label_emb"] = {"embedding": sd[f"{prefix}label_emb.weight"]}
    return params


# --------------------------------------------------------------------------
# Diffusers UNet layout (UNet2DConditionModel, unet_2d_condition.py:50 —
# the reference's second model path, used by pipeline/clipguided_txt2img.py
# and null inversion). Translated key-by-key to the CompVis layout, then fed
# through convert_unet.
# --------------------------------------------------------------------------

_DIFFUSERS_RES_MAP = {
    "norm1": "in_layers.0",
    "conv1": "in_layers.2",
    "time_emb_proj": "emb_layers.1",
    "norm2": "out_layers.0",
    "conv2": "out_layers.3",
    "conv_shortcut": "skip_connection",
}


def diffusers_to_compvis_unet(sd: StateDict, prefix: str = "") -> Dict[str, Array]:
    """Translate a diffusers ``UNet2DConditionModel`` state_dict to CompVis
    ``model.diffusion_model``-style keys (without the prefix).

    Block-index correspondence (diffusers down/mid/up <-> CompVis
    input/middle/output): input_blocks[0] = conv_in; each down level i
    contributes R resnets (+attentions) at 1+i*(R+1)+j and a downsampler at
    1+i*(R+1)+R; up levels have R+1 resnets with the upsampler appended as
    an extra sublayer of the level's last block.
    """
    import re

    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    # layers_per_block (R) and which up levels carry attention
    r_down = -1
    up_attn_levels = set()
    for k in sd:
        m = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.", k)
        if m:
            r_down = max(r_down, int(m.group(2)) + 1)
        m = re.match(r"up_blocks\.(\d+)\.attentions\.", k)
        if m:
            up_attn_levels.add(int(m.group(1)))
    if r_down <= 0:
        raise ValueError("not a diffusers UNet state_dict (no down_blocks.*)")
    r = r_down

    out: Dict[str, Array] = {}
    for k, v in sd.items():
        parts = k.split(".")
        if k.startswith("conv_in."):
            nk = f"input_blocks.0.0.{parts[-1]}"
        elif k.startswith("time_embedding.linear_1."):
            nk = f"time_embed.0.{parts[-1]}"
        elif k.startswith("time_embedding.linear_2."):
            nk = f"time_embed.2.{parts[-1]}"
        elif k.startswith("class_embedding."):
            nk = f"label_emb.{parts[-1]}"
        elif k.startswith("conv_norm_out."):
            nk = f"out.0.{parts[-1]}"
        elif k.startswith("conv_out."):
            nk = f"out.2.{parts[-1]}"
        elif parts[0] == "down_blocks":
            i, kind, j = int(parts[1]), parts[2], int(parts[3])
            rest = ".".join(parts[4:])
            if kind == "resnets":
                head, _, tail = rest.partition(".")
                nk = (
                    f"input_blocks.{1 + i * (r + 1) + j}.0."
                    f"{_DIFFUSERS_RES_MAP[head]}.{tail}"
                )
            elif kind == "attentions":
                nk = f"input_blocks.{1 + i * (r + 1) + j}.1.{rest}"
            elif kind == "downsamplers":
                nk = f"input_blocks.{1 + i * (r + 1) + r}.0.op.{parts[-1]}"
            else:
                raise ValueError(f"unknown down_blocks entry {k!r}")
        elif parts[0] == "mid_block":
            kind, j = parts[1], int(parts[2])
            rest = ".".join(parts[3:])
            if kind == "resnets":
                head, _, tail = rest.partition(".")
                nk = f"middle_block.{0 if j == 0 else 2}.{_DIFFUSERS_RES_MAP[head]}.{tail}"
            elif kind == "attentions":
                nk = f"middle_block.1.{rest}"
            else:
                raise ValueError(f"unknown mid_block entry {k!r}")
        elif parts[0] == "up_blocks":
            i, kind, j = int(parts[1]), parts[2], int(parts[3])
            rest = ".".join(parts[4:])
            # diffusers up levels have R+1 resnets each
            if kind == "resnets":
                head, _, tail = rest.partition(".")
                nk = (
                    f"output_blocks.{i * (r + 1) + j}.0."
                    f"{_DIFFUSERS_RES_MAP[head]}.{tail}"
                )
            elif kind == "attentions":
                nk = f"output_blocks.{i * (r + 1) + j}.1.{rest}"
            elif kind == "upsamplers":
                sub = 2 if i in up_attn_levels else 1
                nk = f"output_blocks.{i * (r + 1) + r}.{sub}.conv.{parts[-1]}"
            else:
                raise ValueError(f"unknown up_blocks entry {k!r}")
        else:
            # time_proj buffers etc. have no parameters; skip unknown
            # non-parameter entries silently only if tensor-free
            continue
        out[nk] = v
    return out


def convert_unet_diffusers(
    cfg: UNetConfig, sd: StateDict, prefix: str = ""
) -> Dict[str, Any]:
    """Load a diffusers-layout UNet state_dict onto the (single) CompVis-plan
    UNet — SURVEY §7 hard-part #5's second key map."""
    return convert_unet(cfg, diffusers_to_compvis_unet(sd, prefix), prefix="")


# --------------------------------------------------------------------------
# VAE (first_stage_model.* layout)
# --------------------------------------------------------------------------


def _convert_vae_res(sd: StateDict, p: str) -> Dict[str, Any]:
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    return out


def _convert_vae_attn(sd: StateDict, p: str) -> Dict[str, Any]:
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "q": _conv(sd, f"{p}.q"),
        "k": _conv(sd, f"{p}.k"),
        "v": _conv(sd, f"{p}.v"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def convert_vae(
    cfg: VAEConfig, sd: StateDict, prefix: str = "first_stage_model."
) -> Dict[str, Any]:
    n_levels = len(cfg.ch_mult)

    enc: Dict[str, Any] = {
        "conv_in": _conv(sd, f"{prefix}encoder.conv_in"),
        "down": [],
    }
    for lv in range(n_levels):
        base = f"{prefix}encoder.down.{lv}"
        down: Dict[str, Any] = {
            "block": [
                _convert_vae_res(sd, f"{base}.block.{b}")
                for b in range(cfg.num_res_blocks)
            ],
            "attn": [],
        }
        b = 0
        while f"{base}.attn.{b}.q.weight" in sd:
            down["attn"].append(_convert_vae_attn(sd, f"{base}.attn.{b}"))
            b += 1
        if f"{base}.downsample.conv.weight" in sd:
            down["downsample"] = _conv(sd, f"{base}.downsample.conv")
        enc["down"].append(down)
    enc["mid"] = {
        "block_1": _convert_vae_res(sd, f"{prefix}encoder.mid.block_1"),
        "attn_1": _convert_vae_attn(sd, f"{prefix}encoder.mid.attn_1"),
        "block_2": _convert_vae_res(sd, f"{prefix}encoder.mid.block_2"),
    }
    enc["norm_out"] = _norm(sd, f"{prefix}encoder.norm_out")
    enc["conv_out"] = _conv(sd, f"{prefix}encoder.conv_out")

    dec: Dict[str, Any] = {
        "conv_in": _conv(sd, f"{prefix}decoder.conv_in"),
        "mid": {
            "block_1": _convert_vae_res(sd, f"{prefix}decoder.mid.block_1"),
            "attn_1": _convert_vae_attn(sd, f"{prefix}decoder.mid.attn_1"),
            "block_2": _convert_vae_res(sd, f"{prefix}decoder.mid.block_2"),
        },
        "up": [],
    }
    for lv in range(n_levels):
        base = f"{prefix}decoder.up.{lv}"
        up: Dict[str, Any] = {
            "block": [
                _convert_vae_res(sd, f"{base}.block.{b}")
                for b in range(cfg.num_res_blocks + 1)
            ],
            "attn": [],
        }
        b = 0
        while f"{base}.attn.{b}.q.weight" in sd:
            up["attn"].append(_convert_vae_attn(sd, f"{base}.attn.{b}"))
            b += 1
        if f"{base}.upsample.conv.weight" in sd:
            up["upsample"] = _conv(sd, f"{base}.upsample.conv")
        dec["up"].append(up)
    dec["norm_out"] = _norm(sd, f"{prefix}decoder.norm_out")
    dec["conv_out"] = _conv(sd, f"{prefix}decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, f"{prefix}quant_conv"),
        "post_quant_conv": _conv(sd, f"{prefix}post_quant_conv"),
    }


# --------------------------------------------------------------------------
# CLIP text towers
# --------------------------------------------------------------------------


def convert_clip_hf(
    cfg: CLIPTextConfig,
    sd: StateDict,
    prefix: str = "cond_stage_model.transformer.",
) -> Dict[str, Any]:
    """HF CLIPTextModel layout (SD 1.x)."""
    t = f"{prefix}text_model."
    params: Dict[str, Any] = {
        "token_embedding": sd[f"{t}embeddings.token_embedding.weight"],
        "position_embedding": sd[f"{t}embeddings.position_embedding.weight"],
        "layers": [],
        "final_ln": _norm(sd, f"{t}final_layer_norm"),
    }
    for i in range(cfg.num_layers):
        b = f"{t}encoder.layers.{i}"
        params["layers"].append(
            {
                "ln1": _norm(sd, f"{b}.layer_norm1"),
                "q": _linear(sd, f"{b}.self_attn.q_proj"),
                "k": _linear(sd, f"{b}.self_attn.k_proj"),
                "v": _linear(sd, f"{b}.self_attn.v_proj"),
                "out": _linear(sd, f"{b}.self_attn.out_proj"),
                "ln2": _norm(sd, f"{b}.layer_norm2"),
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            }
        )
    if f"{prefix}text_projection.weight" in sd:
        params["text_projection"] = _linear(sd, f"{prefix}text_projection", bias=False)
    return params


def convert_clip_openclip(
    cfg: CLIPTextConfig, sd: StateDict, prefix: str = "cond_stage_model.model."
) -> Dict[str, Any]:
    """OpenCLIP text-tower layout (SD 2.x): packed in_proj qkv, c_fc/c_proj."""
    d = cfg.hidden_size
    params: Dict[str, Any] = {
        "token_embedding": sd[f"{prefix}token_embedding.weight"],
        "position_embedding": sd[f"{prefix}positional_embedding"],
        "layers": [],
        "final_ln": _norm(sd, f"{prefix}ln_final"),
    }
    for i in range(cfg.num_layers):
        b = f"{prefix}transformer.resblocks.{i}"
        w = sd[f"{b}.attn.in_proj_weight"]  # [3d, d]
        bias = sd[f"{b}.attn.in_proj_bias"]  # [3d]
        params["layers"].append(
            {
                "ln1": _norm(sd, f"{b}.ln_1"),
                "q": {"kernel": w[:d].T, "bias": bias[:d]},
                "k": {"kernel": w[d : 2 * d].T, "bias": bias[d : 2 * d]},
                "v": {"kernel": w[2 * d :].T, "bias": bias[2 * d :]},
                "out": _linear(sd, f"{b}.attn.out_proj"),
                "ln2": _norm(sd, f"{b}.ln_2"),
                "fc1": _linear(sd, f"{b}.mlp.c_fc"),
                "fc2": _linear(sd, f"{b}.mlp.c_proj"),
            }
        )
    if f"{prefix}text_projection" in sd:
        params["text_projection"] = {"kernel": sd[f"{prefix}text_projection"]}
    return params


def convert_clip_vision_hf(
    cfg, sd: StateDict, prefix: str = ""
) -> Dict[str, Any]:
    """HF ``CLIPVisionModelWithProjection`` layout — the guide CLIP the
    reference loads for gradient guidance (diffusion.py:24-26,
    clipguided_txt2img.py feature_extractor path). ``cfg``:
    ``CLIPVisionConfig``."""
    v = f"{prefix}vision_model."
    params: Dict[str, Any] = {
        "class_embedding": sd[f"{v}embeddings.class_embedding"],
        # torch conv [O, I, kh, kw] -> HWIO
        "patch_embedding": np.transpose(
            sd[f"{v}embeddings.patch_embedding.weight"], (2, 3, 1, 0)
        ),
        "position_embedding": sd[f"{v}embeddings.position_embedding.weight"],
        # HF's actual attribute name is the misspelled "pre_layrnorm"
        "pre_ln": _norm(
            sd,
            f"{v}pre_layrnorm"
            if f"{v}pre_layrnorm.weight" in sd
            else f"{v}pre_layernorm",
        ),
        "layers": [],
        "post_ln": _norm(sd, f"{v}post_layernorm"),
    }
    for i in range(cfg.num_layers):
        b = f"{v}encoder.layers.{i}"
        params["layers"].append(
            {
                "ln1": _norm(sd, f"{b}.layer_norm1"),
                "q": _linear(sd, f"{b}.self_attn.q_proj"),
                "k": _linear(sd, f"{b}.self_attn.k_proj"),
                "v": _linear(sd, f"{b}.self_attn.v_proj"),
                "out": _linear(sd, f"{b}.self_attn.out_proj"),
                "ln2": _norm(sd, f"{b}.layer_norm2"),
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            }
        )
    if f"{prefix}visual_projection.weight" in sd:
        params["visual_projection"] = _linear(
            sd, f"{prefix}visual_projection", bias=False
        )
    return params


def attach_hypernetwork(unet_params, hyper_sd: StateDict, multiplier: float = 1.0):
    """Attach AUTOMATIC1111-style hypernetwork modules to the cross-attention
    k/v projections (the hook the reference installs per CrossAttention,
    attention.py:139-144). ``hyper_sd`` maps context-dim -> two-layer MLP
    weights: {dim: {"k": {"linear1","linear2"}, "v": {...}}} with torch
    [out,in] layouts, or flat '<dim>.k.linear1.weight' keys.

    Returns a NEW params pytree with "hyper_k"/"hyper_v" entries added to
    every cross-attn block whose context dim has hypernetwork weights.
    """
    import copy

    # normalize flat layouts
    by_dim: Dict[int, Dict[str, Dict[str, Array]]] = {}
    for k, v in hyper_sd.items():
        if isinstance(v, dict):
            by_dim[int(k)] = v
        else:
            parts = k.split(".")  # dim.k.linear1.weight
            dim, kv, lin, kind = int(parts[0]), parts[1], parts[2], parts[3]
            slot = by_dim.setdefault(dim, {}).setdefault(kv, {}).setdefault(lin, {})
            slot["kernel" if kind == "weight" else "bias"] = (
                v.T if kind == "weight" else v
            )

    for dim, kvs in by_dim.items():
        for kv, mlp in kvs.items():
            missing = {"linear1", "linear2"} - set(mlp)
            if missing:
                raise ValueError(
                    f"hypernetwork for dim {dim} slot {kv!r} is missing "
                    f"{sorted(missing)} (each slot needs linear1 + linear2 "
                    "weight/bias pairs)"
                )

    params = copy.deepcopy(unet_params)

    def visit(blocks):
        for block in blocks:
            for layer in block if isinstance(block, list) else [block]:
                if not isinstance(layer, dict) or "blocks" not in layer:
                    continue
                for tb in layer["blocks"]:
                    attn2 = tb["attn2"]
                    dim = attn2["to_k"]["kernel"].shape[0]
                    if dim in by_dim:
                        for kv, name in (("k", "hyper_k"), ("v", "hyper_v")):
                            if kv in by_dim[dim]:
                                mod = {
                                    "linear1": by_dim[dim][kv]["linear1"],
                                    "linear2": by_dim[dim][kv]["linear2"],
                                    "multiplier": multiplier,
                                }
                                attn2[name] = mod

    visit(params["input_blocks"])
    visit([params["middle_block"]])
    visit(params["output_blocks"])
    return params


# --------------------------------------------------------------------------
# whole-checkpoint entry point
# --------------------------------------------------------------------------


def apply_ema_weights(sd: Dict[str, Array]) -> Dict[str, Array]:
    """Swap UNet weights for their EMA shadows when the checkpoint carries
    them (LitEma buffers: 'model_ema.' + param name with dots stripped;
    /root/reference/cpd/models/ema.py:13-27, used via ema_scope
    ddpm.py:219-232)."""
    if not any(k.startswith("model_ema.") for k in sd):
        return sd
    out = dict(sd)
    prefix = "model.diffusion_model."
    for k in sd:
        if k.startswith(prefix):
            ema_key = "model_ema." + k[len("model.") :].replace(".", "")
            if ema_key in sd:
                out[k] = sd[ema_key]
    return out


def make_it_fit(
    sd: StateDict, target_shapes: Dict[str, tuple]
) -> Dict[str, Array]:
    """Shape-adaptation weight surgery (DDPM.init_from_ckpt make_it_fit,
    ddpm.py:245-287): fit checkpoint weights onto a model with different
    first-two-axis sizes (e.g. seed a 9-channel inpaint UNet's input conv
    from a 4-channel SD checkpoint) by cyclic tiling over the first two
    (torch-layout: out, in) axes. For >=2-D weights the result is divided by
    an input-usage count so the layer's output scale is preserved when the
    input dim grows. Operates on the RAW torch-layout state dict, before
    layout conversion.

    Quirk reproduced from the reference: the usage counter starts at 1, not
    0 (ddpm.py:272), so each count is (1 + real uses) — the surgery halves
    weights whose input dim is unchanged while the output dim grows.
    Trailing axes (conv spatial dims) must match.
    """
    out = dict(sd)
    for name, want in target_shapes.items():
        if name not in sd:
            continue
        old = np.asarray(sd[name])
        want = tuple(want)
        if old.shape == want:
            continue
        if len(old.shape) != len(want):
            raise ValueError(
                f"{name}: rank mismatch {old.shape} -> {want} "
                "(make_it_fit only adapts same-rank weights)"
            )
        if len(want) > 2 and old.shape[2:] != want[2:]:
            raise ValueError(
                f"{name}: trailing axes must match ({old.shape} -> {want})"
            )
        idx0 = np.arange(want[0]) % old.shape[0]
        if old.ndim == 1:
            out[name] = old[idx0]
            continue
        idx1 = np.arange(want[1]) % old.shape[1]
        new = old[idx0][:, idx1]
        # input-usage normalization (ddpm.py:271-283), incl. the init-at-one
        n_used_old = np.ones(old.shape[1])
        np.add.at(n_used_old, idx1, 1)
        n_used_new = n_used_old[idx1]
        new = new / n_used_new.reshape((1, -1) + (1,) * (old.ndim - 2))
        out[name] = new.astype(old.dtype)
    return out


def zero_extend_input_conv(
    sd: StateDict, new_in_channels: int, keep_dims: int = 4
) -> Dict[str, Array]:
    """Finetune seeding for concat-conditioned variants
    (LatentFinetuneDiffusion.init_from_ckpt, ddpm.py:1700-1711): widen the
    UNet input conv to ``new_in_channels``, keeping the checkpoint's first
    ``keep_dims`` input channels and ZERO-initializing the new ones — so the
    seeded model initially ignores the concat conditioning and reproduces
    the base model exactly. Raw torch-layout [out, in, kh, kw] state dict.
    """
    key = "model.diffusion_model.input_blocks.0.0.weight"
    ema_key = "model_ema.diffusion_modelinput_blocks00weight"
    out = dict(sd)
    for k in (key, ema_key):
        if k not in sd:
            continue
        old = np.asarray(sd[k])
        if old.shape[1] >= new_in_channels:
            continue
        new = np.zeros(
            (old.shape[0], new_in_channels) + old.shape[2:], old.dtype
        )
        new[:, :keep_dims] = old[:, :keep_dims]
        out[k] = new
    return out


def detect_sd_version(sd: StateDict) -> str:
    """'sd2' if the checkpoint carries an OpenCLIP tower or 1024-dim context."""
    if any(k.startswith("cond_stage_model.model.") for k in sd):
        return "sd2"
    return "sd1"


def load_sd_checkpoint(path: str, use_ema: bool = False):
    """Load a CompVis SD checkpoint into a model bundle:
    (unet_cfg, unet_params, vae_cfg, vae_params, clip_cfg, clip_params, version).
    Mirrors the manager's model_dict split (manager.py:18-23).
    ``use_ema``: prefer EMA shadow weights when present."""
    import dataclasses

    sd = load_state_dict(path)
    if use_ema:
        sd = apply_ema_weights(sd)
    version = detect_sd_version(sd)
    in_ch = sd["model.diffusion_model.input_blocks.0.0.weight"].shape[1]
    if version == "sd2":
        unet_cfg = UNetConfig.sd2_depth() if in_ch == 5 else UNetConfig.sd21()
        clip_cfg = CLIPTextConfig.sd21()
        clip_params = convert_clip_openclip(clip_cfg, sd)
    else:
        unet_cfg = UNetConfig.sd_inpaint() if in_ch == 9 else UNetConfig.sd15()
        clip_cfg = CLIPTextConfig.sd15()
        clip_params = convert_clip_hf(clip_cfg, sd)
    if unet_cfg.in_channels != in_ch:
        # non-standard concat widths (finetune variants) follow the ckpt
        unet_cfg = dataclasses.replace(unet_cfg, in_channels=in_ch)
    vae_cfg = VAEConfig.sd()
    return {
        "version": version,
        "unet": (unet_cfg, convert_unet(unet_cfg, sd)),
        "vae": (vae_cfg, convert_vae(vae_cfg, sd)),
        "clip": (clip_cfg, clip_params),
    }
