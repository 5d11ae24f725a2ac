"""Model configuration from CompVis-style YAML.

Parity target: /root/reference/cpd/build_model.py:27-59
(load_model_from_config: OmegaConf YAML -> instantiate_from_config ->
load_state_dict) and the reference's cpd/config/*.yaml files — which this
module reads directly. The stringly ``target:`` class paths map onto an
explicit allowlist of our typed configs (no dynamic import, SURVEY §5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu import schedules as S

__all__ = ["load_yaml_config", "bundle_from_yaml", "unet_config_from_yaml"]


def load_yaml_config(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def unet_config_from_yaml(params: Dict[str, Any]) -> M.UNetConfig:
    """Map CompVis UNetModel params (config-1.49.yaml:28-43 /
    v2-inference.yaml:20-37) onto UNetConfig."""
    return M.UNetConfig(
        in_channels=params.get("in_channels", 4),
        out_channels=params.get("out_channels", 4),
        model_channels=params.get("model_channels", 320),
        num_res_blocks=params.get("num_res_blocks", 2),
        attention_resolutions=tuple(params.get("attention_resolutions", (4, 2, 1))),
        channel_mult=tuple(params.get("channel_mult", (1, 2, 4, 4))),
        num_heads=params.get("num_heads", -1 if "num_head_channels" in params else 8),
        num_head_channels=params.get("num_head_channels", -1),
        transformer_depth=params.get("transformer_depth", 1),
        context_dim=params.get("context_dim"),
        use_linear_in_transformer=params.get("use_linear_in_transformer", False),
        use_scale_shift_norm=params.get("use_scale_shift_norm", False),
        num_classes=params.get("num_classes"),
    )


def vae_config_from_yaml(first_stage: Dict[str, Any]) -> M.VAEConfig:
    dd = first_stage.get("params", {}).get("ddconfig", {})
    return M.VAEConfig(
        in_channels=dd.get("in_channels", 3),
        out_channels=dd.get("out_ch", 3),
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        z_channels=dd.get("z_channels", 4),
        embed_dim=first_stage.get("params", {}).get("embed_dim", 4),
        double_z=dd.get("double_z", True),
        resolution=dd.get("resolution", 512),
    )


_COND_STAGE_MAP = {
    "cpd.models.embedder.FrozenCLIPEmbedder": ("sd15", "last"),
    "cpd.models.embedder.FrozenOpenCLIPEmbedder": ("sd21", "penultimate"),
    "ldm.modules.encoders.modules.FrozenCLIPEmbedder": ("sd15", "last"),
    "ldm.modules.encoders.modules.FrozenOpenCLIPEmbedder": ("sd21", "penultimate"),
}


def bundle_from_yaml(
    path: str,
    checkpoint_path: Optional[str] = None,
    vocab_path: Optional[str] = None,
    seed: int = 0,
):
    """YAML -> ModelBundle. With checkpoint_path, weights load through the
    key-mapped converters; otherwise random init (tests/benches)."""
    import jax

    from complex_prompt_diffusion_tpu.pipeline import ModelBundle
    from complex_prompt_diffusion_tpu.prompts.tokenizer import get_tokenizer

    conf = load_yaml_config(path)
    model = conf.get("model", conf)
    params = model.get("params", {})

    unet_cfg = unet_config_from_yaml(params.get("unet_config", {}).get("params", {}))
    vae_cfg = vae_config_from_yaml(params.get("first_stage_config", {}))

    cond_target = params.get("cond_stage_config", {})
    if isinstance(cond_target, dict):
        cond_target = cond_target.get("target", "")
    version, clip_layer = ("sd15", "last")
    for target, (ver, layer) in _COND_STAGE_MAP.items():
        if cond_target == target or cond_target.endswith(
            target.rsplit(".", 1)[-1]
        ):
            version, clip_layer = ver, layer
            break

    clip_cfg = (
        M.CLIPTextConfig.sd15() if version == "sd15" else M.CLIPTextConfig.sd21()
    )
    tables = S.make_diffusion_tables(
        num_train_timesteps=params.get("timesteps", 1000),
        beta_start=params.get("linear_start", 0.00085),
        beta_end=params.get("linear_end", 0.012),
    )
    parameterization = params.get("parameterization", "eps")

    if checkpoint_path:
        bundle = ModelBundle.from_checkpoint(checkpoint_path, vocab_path)
        return dataclasses.replace(
            bundle,
            unet_cfg=unet_cfg,
            vae_cfg=vae_cfg,
            tables=tables,
            parameterization=parameterization,
            clip_layer=clip_layer,
        )

    key = jax.random.PRNGKey(seed)
    return ModelBundle(
        version="sd1" if version == "sd15" else "sd2",
        unet_cfg=unet_cfg,
        unet_params=M.init_unet(key, unet_cfg),
        vae_cfg=vae_cfg,
        vae_params=M.init_vae(key, vae_cfg),
        clip_cfg=clip_cfg,
        clip_params=M.init_clip_text(key, clip_cfg),
        tokenizer=get_tokenizer(vocab_path, pad_with_eos=(version == "sd15")),
        tables=tables,
        parameterization=parameterization,
        clip_layer=clip_layer,
    )
