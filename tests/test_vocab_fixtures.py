"""Real-format vocab fixtures for the BPE tokenizers (VERDICT r1 item 9b).

No real CLIP vocab exists in this air-gapped image, so the fixtures here are
REAL-FORMAT files (OpenAI ``bpe_simple_vocab_16e6.txt.gz`` layout and HF
``vocab.json``+``merges.txt``) with a small merge table whose token ids are
hand-derivable from the construction — NOT the HashTokenizer stand-in.

Key property exploited: in the OpenAI layout the vocab is DERIVED from the
byte tables + merges (tokenizer.py:100-110), so base ids are identical to
the real CLIP vocab: ``a`` = 64, ``a</w>`` = 320 (= 256 + byte-order index
of 'a') — the same ``320`` the real tokenizer produces for "a". Merged
tokens get 512+rank; specials follow. Golden sequences below are computed
by hand from the BPE algorithm, so these tests verify the MERGE MACHINERY
and the file parsers, byte-for-byte, in both the Python and C++
tokenizers.

When a real vocab is supplied via $CPD_TPU_CLIP_VOCAB, the spot checks in
``TestRealVocabIfPresent`` additionally pin well-known real ids.
"""

import gzip
import json
import os

import numpy as np
import pytest

from complex_prompt_diffusion_tpu.prompts.tokenizer import (
    ClipBPETokenizer,
    bytes_to_unicode,
)

MERGES = [
    ("t", "h"),          # 512
    ("th", "e</w>"),     # 513
    ("c", "a"),          # 514
    ("ca", "t</w>"),     # 515
    ("d", "o"),          # 516
    ("do", "g</w>"),     # 517
]
BOS, EOS = 518, 519


def _base_id(ch: str) -> int:
    """Index of a byte's printable symbol in the derived base vocab."""
    return list(bytes_to_unicode().values()).index(
        bytes_to_unicode()[ord(ch)]
    )


@pytest.fixture(scope="module")
def gz_vocab(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "bpe_fixture.txt.gz"
    lines = ["#version: fixture"] + [" ".join(m) for m in MERGES]
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return str(p)


@pytest.fixture(scope="module")
def hf_vocab(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab_hf")
    base = list(bytes_to_unicode().values())
    vocab = {v: i for i, v in enumerate(base)}
    vocab.update({v + "</w>": 256 + i for i, v in enumerate(base)})
    nxt = 512
    for m in MERGES:
        vocab["".join(m)] = nxt
        nxt += 1
    vocab["<|startoftext|>"] = nxt
    vocab["<|endoftext|>"] = nxt + 1
    with open(d / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: fixture\n" + "\n".join(" ".join(m) for m in MERGES))
    return str(d / "vocab.json")


class TestFixtureVocab:
    def test_base_ids_match_real_clip_layout(self):
        """The derived base vocab gives the REAL CLIP ids for base+</w>
        tokens: 'a</w>' is 320 in the actual OpenAI vocab."""
        assert _base_id("a") == 64
        assert 256 + _base_id("a") == 320

    @pytest.mark.parametrize("fixture", ["gz", "hf"])
    def test_golden_sequences(self, fixture, gz_vocab, hf_vocab):
        tok = ClipBPETokenizer(gz_vocab if fixture == "gz" else hf_vocab)
        assert tok.bos_id == BOS and tok.eos_id == EOS
        # hand-derived BPE: "a" -> a</w>=320; "cat" -> (c,a,t</w>) -merge
        # c+a-> (ca,t</w>) -merge-> cat</w>=515; "the"->513; "dog"->517
        ids = tok("a cat")[0]
        assert list(ids[:4]) == [BOS, 320, 515, EOS]
        assert (ids[4:] == EOS).all()  # pad_with_eos default
        ids = tok("the dog")[0]
        assert list(ids[:4]) == [BOS, 513, 517, EOS]

    def test_partial_merges_fall_back_to_bytes(self, gz_vocab):
        tok = ClipBPETokenizer(gz_vocab)
        # "ox" has no merges: 'o' base + 'x</w>'
        ids = tok("ox")[0]
        assert list(ids[:4]) == [
            BOS, _base_id("o"), 256 + _base_id("x"), EOS,
        ]
        # "cats": merges stop at 'ca' ('t' has no </w> here): ca + t + s</w>
        ids = tok("cats")[0]
        assert list(ids[:5]) == [
            BOS, 514, _base_id("t"), 256 + _base_id("s"), EOS,
        ]

    def test_zero_padding_mode(self, gz_vocab):
        tok = ClipBPETokenizer(gz_vocab, pad_with_eos=False)
        ids = tok("a")[0]
        assert list(ids[:3]) == [BOS, 320, EOS]
        assert (ids[3:] == 0).all()

    def test_cpp_tokenizer_matches_golden(self, gz_vocab):
        from complex_prompt_diffusion_tpu.prompts.tokenizer_native import (
            get_native_tokenizer,
            load_library,
        )

        if load_library() is None:
            pytest.skip("native tokenizer library not built")
        nat = get_native_tokenizer(gz_vocab)
        if nat is None:
            pytest.skip("native tokenizer unavailable")
        ids = nat("a cat")[0]
        assert list(ids[:4]) == [BOS, 320, 515, EOS]
        # cross-check python on a harder string
        py = ClipBPETokenizer(gz_vocab)
        for text in ("the dog ox cats", "a CAT  the", "dog, cat!"):
            np.testing.assert_array_equal(nat(text), py(text))


class TestRealVocabIfPresent:
    """Golden real-vocab ids — runs only when a real CLIP vocab file is
    supplied ($CPD_TPU_CLIP_VOCAB); air-gapped CI skips."""

    def test_known_ids(self):
        path = os.environ.get("CPD_TPU_CLIP_VOCAB", "")
        if not path or not os.path.exists(path):
            pytest.skip("no real CLIP vocab in environment")
        tok = ClipBPETokenizer(path)
        assert tok.bos_id == 49406 and tok.eos_id == 49407
        ids = tok("a cat")[0]
        assert list(ids[:4]) == [49406, 320, 2368, 49407]
