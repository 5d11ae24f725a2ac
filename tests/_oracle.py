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
import sys
import types

_REF = "/root/reference"
_ready = False
_failed = None


def _stub(name, **attrs):
    m = sys.modules.setdefault(name, types.ModuleType(name))
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
