"""ctypes binding for the native C++ BPE tokenizer (native/cpd_tokenizer.cpp).

Drop-in replacement for :class:`~.tokenizer.ClipBPETokenizer`'s
``encode_text``: the C++ core does splitting + byte mapping + BPE; sequence
assembly (BOS/EOS/pad/77) stays in the shared Python base class. Builds the
shared library on first use when a compiler is available; falls back
silently (callers use :func:`get_native_tokenizer` and check for None).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from complex_prompt_diffusion_tpu.prompts.tokenizer import (
    ClipBPETokenizer,
    _TokenizerBase,
)

__all__ = ["NativeClipTokenizer", "get_native_tokenizer", "load_library"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None
_LIB_FAILED = False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) libcpd_tokenizer.so."""
    global _LIB, _LIB_FAILED
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED:
        return None
    so_path = os.path.join(_NATIVE_DIR, "libcpd_tokenizer.so")
    try:
        if not os.path.exists(so_path):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(so_path)
        lib.cpd_tok_create.restype = ctypes.c_void_p
        lib.cpd_tok_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.cpd_tok_encode.restype = ctypes.c_int
        lib.cpd_tok_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.cpd_tok_bos.restype = ctypes.c_int
        lib.cpd_tok_bos.argtypes = [ctypes.c_void_p]
        lib.cpd_tok_eos.restype = ctypes.c_int
        lib.cpd_tok_eos.argtypes = [ctypes.c_void_p]
        lib.cpd_tok_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib
    except Exception:
        _LIB_FAILED = True
        return None


class NativeClipTokenizer(_TokenizerBase):
    """C++-backed tokenizer sharing the Python sequence contract."""

    def __init__(self, py_tok: ClipBPETokenizer):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native tokenizer library unavailable")
        self._lib = lib
        # serialize vocab in id order + merges in rank order
        id_to_tok = sorted(py_tok.encoder.items(), key=lambda kv: kv[1])
        vocab_buf = "\n".join(t for t, _ in id_to_tok).encode("utf-8")
        merges = sorted(py_tok.bpe_ranks.items(), key=lambda kv: kv[1])
        merges_buf = "\n".join(f"{a} {b}" for (a, b), _ in merges).encode("utf-8")
        self._handle = lib.cpd_tok_create(vocab_buf, merges_buf)
        self.bos_id = lib.cpd_tok_bos(self._handle)
        self.eos_id = lib.cpd_tok_eos(self._handle)
        self.pad_id = py_tok.pad_id
        self._buf = (ctypes.c_int * 4096)()

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.cpd_tok_destroy(self._handle)
        except Exception:
            pass

    def encode_text(self, text: str) -> List[int]:
        n = self._lib.cpd_tok_encode(
            self._handle, text.encode("utf-8"), self._buf, len(self._buf)
        )
        return list(self._buf[:n])


def get_native_tokenizer(
    vocab_path: str, merges_path: Optional[str] = None, pad_with_eos: bool = True
) -> Optional[NativeClipTokenizer]:
    """Build a native tokenizer from vocab files, or None if unavailable."""
    try:
        py_tok = ClipBPETokenizer(vocab_path, merges_path, pad_with_eos)
        return NativeClipTokenizer(py_tok)
    except Exception:
        return None
