"""Import the reference implementation (/root/reference) as a numerics oracle.

The reference is pure torch; we run it on CPU with random weights, convert
its state_dict through our checkpoint loader, and compare activations. Heavy
optional deps (open_clip, torchvision, taming, lightning, skimage, omegaconf)
are stubbed — the model-definition modules don't actually use them at
inference time. Two latent bugs in the reference are worked around:
``collections.Ordereddict`` (vram.py:3) and SpatialTransformer not accepting
the ``use_linear``/``use_checkpoint`` kwargs the UNet passes (unet.py:592 vs
attention.py:500).
"""

import collections
import os
import sys
import types

_REF = "/root/reference"
_ready = False
_failed = None


def _stub(name, **attrs):
    m = sys.modules.setdefault(name, types.ModuleType(name))
    if m.__spec__ is None:
        # transformers probes importlib.util.find_spec("torchvision"),
        # which raises ValueError on modules with __spec__ = None
        import importlib.machinery

        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


class _AnyCallable:
    def __init__(self, *a, **k):
        pass

    def __call__(self, x, *a, **k):
        return x


def setup():
    """Import reference modules; returns the `cpd` package or None."""
    global _ready, _failed
    if _ready:
        return sys.modules.get("cpd")
    if _failed:
        return None
    try:
        collections.Ordereddict = dict
        _stub("open_clip")
        _stub("pytorch_lightning", LightningModule=object)
        _stub("taming")
        _stub("taming.modules")
        _stub("taming.modules.vqvae")
        _stub("taming.modules.vqvae.quantize", VectorQuantizer2=object)
        tv = _stub("torchvision")
        tv.transforms = _stub(
            "torchvision.transforms",
            Normalize=_AnyCallable,
            GaussianBlur=_AnyCallable,
            Resize=_AnyCallable,
        )
        sk = _stub("skimage")
        sk.measure = _stub("skimage.measure")
        sk.exposure = _stub("skimage.exposure")
        oc = _stub("omegaconf")
        oc.listconfig = _stub(
            "omegaconf.listconfig", ListConfig=type("ListConfig", (), {})
        )
        if _REF not in sys.path:
            sys.path.insert(0, _REF)

        import torch

        # the reference reads CUDA memory stats inside forward passes
        # (attention.py:302-307, autoencoder.py:236); fake a huge free pool
        torch.cuda.memory_stats = lambda *a, **k: {
            "active_bytes.all.current": 0,
            "reserved_bytes.all.current": 0,
        }
        torch.cuda.mem_get_info = lambda *a, **k: (1 << 40, 1 << 40)
        torch.cuda.current_device = lambda: 0

        import cpd.models.attention as ref_attn

        # unet.py:592 passes use_linear/use_checkpoint which the class lacks
        _orig_init = ref_attn.SpatialTransformer.__init__

        def _patched(self, *args, **kwargs):
            kwargs.pop("use_linear", None)
            kwargs.pop("use_checkpoint", None)
            return _orig_init(self, *args, **kwargs)

        if not getattr(ref_attn.SpatialTransformer, "_patched_kwargs", False):
            ref_attn.SpatialTransformer.__init__ = _patched
            ref_attn.SpatialTransformer._patched_kwargs = True

        # run the reference's "cuda" paths on CPU: its safe_to resolves
        # devices through vram.device_lookup, and hot paths call .cuda()
        # directly (ddim.py:303-304)
        import cpd.vram as ref_vram

        ref_vram.device_lookup["cuda"] = torch.device("cpu")
        ref_vram.device_lookup["g"] = torch.device("cpu")
        ref_vram.device_lookup["gpu"] = torch.device("cpu")
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.cuda.empty_cache = lambda: None
        torch.cuda.ipc_collect = lambda: None

        import cpd  # noqa: F401

        _ready = True
        return sys.modules["cpd"]
    except Exception as e:  # pragma: no cover
        _failed = e
        return None


_diffusers_unet_cls = None


def setup_diffusers_unet():
    """Make the reference's diffusers-clone UNet importable and return the
    UNet2DConditionModel class (or None).

    The clone files are dead code in the reference: unet_2d_condition.py:21-23
    imports ``..configuration_utils`` / ``..modeling_utils`` / ``..utils``
    which do not exist at the cpd package root (and ``modeling_utils``
    nowhere at all); unet_2d_blocks.py:18 imports Transformer2DModel from
    cpd.models.attention where only the file ``attention.diffusers.py``
    (unimportable name) defines it. We supply the missing plumbing so the
    reference MODEL MATH can serve as the parity oracle for the
    diffusers-layout key map.
    """
    global _diffusers_unet_cls
    if _diffusers_unet_cls is not None:
        return _diffusers_unet_cls
    if setup() is None:
        return None
    try:
        import importlib.util
        import logging as std_logging
        import types

        import torch.nn as nn

        # configuration_utils.py:30,47 imports STDLIB logging but calls
        # logging.get_logger (huggingface API) — another clone bug
        if not hasattr(std_logging, "get_logger"):
            std_logging.get_logger = std_logging.getLogger

        import cpd.models.configuration_utils as cu

        sys.modules.setdefault("cpd.configuration_utils", cu)

        mu = types.ModuleType("cpd.modeling_utils")

        class ModelMixin(nn.Module):
            _supports_gradient_checkpointing = False
            config_name = "config.json"  # real diffusers ModelMixin sets this

            @property
            def dtype(self):
                return next(self.parameters()).dtype

            @property
            def device(self):
                return next(self.parameters()).device

        mu.ModelMixin = ModelMixin
        sys.modules.setdefault("cpd.modeling_utils", mu)

        from cpd.scheduler.util import BaseOutput

        import cpd.models.logging as ref_logging

        ut = types.ModuleType("cpd.utils")
        ut.BaseOutput = BaseOutput
        ut.logging = ref_logging
        iu = types.ModuleType("cpd.utils.import_utils")
        iu.is_xformers_available = lambda: False
        ut.import_utils = iu
        sys.modules.setdefault("cpd.utils", ut)
        sys.modules.setdefault("cpd.utils.import_utils", iu)

        # load attention.diffusers.py (dot in filename) under a proper
        # package-relative module name, then patch its classes into
        # cpd.models.attention where unet_2d_blocks.py:18 looks for them
        spec = importlib.util.spec_from_file_location(
            "cpd.models.attention_diffusers",
            os.path.join(_REF, "cpd", "models", "attention.diffusers.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["cpd.models.attention_diffusers"] = mod
        spec.loader.exec_module(mod)

        import cpd.models.attention as ref_attn

        for name in ("Transformer2DModel", "AttentionBlock", "DualTransformer2DModel"):
            if not hasattr(ref_attn, name):
                setattr(ref_attn, name, getattr(mod, name))

        # unet_2d_condition.py:363 indexes down_block_res_samples[-1] AFTER
        # the final up block has drained the list — an unconditional
        # IndexError (the clone's forward never ran in the reference).
        # Load the module with that single line guarded.
        path = os.path.join(_REF, "cpd", "models", "unet_2d_condition.py")
        src = open(path).read().replace(
            "attn_return.append(down_block_res_samples[-1])",
            "attn_return.append(down_block_res_samples[-1] "
            "if down_block_res_samples else sample)",
        )
        u2c = types.ModuleType("cpd.models.unet_2d_condition")
        u2c.__package__ = "cpd.models"
        u2c.__file__ = path
        exec(compile(src, path, "exec"), u2c.__dict__)
        sys.modules["cpd.models.unet_2d_condition"] = u2c

        _diffusers_unet_cls = u2c.UNet2DConditionModel
        return _diffusers_unet_cls
    except Exception:  # pragma: no cover
        return None


def setup_unipc():
    """Import the reference's UniPC module (cpd/samplers/uni_pc.py).

    It does ``from util import interpolate_fn`` (uni_pc.py:5) — a top-level
    ``util`` module that does not exist anywhere in the reference tree (the
    function lives in cpd/samplers/util.py). Supply the missing module so
    the reference solver can serve as the trajectory oracle.
    """
    if setup() is None:
        return None
    try:
        import cpd.samplers.util as ref_sutil

        _stub("util", interpolate_fn=ref_sutil.interpolate_fn)
        import cpd.samplers.uni_pc as ref_unipc

        return ref_unipc
    except Exception:  # pragma: no cover
        return None
