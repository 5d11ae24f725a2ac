"""Prompt-algebra tests: parser, mask DSL, schedule grammar (the reference's
doctests as golden vectors), interpolation kernels, compose/JSON round-trip."""

import numpy as np
import pytest

from complex_prompt_diffusion_tpu.prompts import (
    ComplexPrompt,
    CompositionalPrompt,
    WeightedPrompt,
    bleed,
    expand_schedule,
    lerp,
    make_mask,
    parse_weighted_prompt,
    plerp,
    slerp,
)
from complex_prompt_diffusion_tpu.prompts.compose import prompt_from_json
from complex_prompt_diffusion_tpu.prompts.tokenizer import HashTokenizer


class TestWeightedParser:
    def test_basic(self):
        p, w = parse_weighted_prompt("a cat:2.0 a dog:1.0")
        assert p == ["a cat", "a dog"]
        assert w == [2.0, 1.0]

    def test_no_weights(self):
        p, w = parse_weighted_prompt("just a prompt")
        assert p == ["just a prompt"]
        assert w == [1.0]

    def test_trailing_weightless(self):
        p, w = parse_weighted_prompt("a:0.5 b")
        assert p == ["a", "b"]
        assert w == [0.5, 1.0]

    def test_bad_weight_defaults(self):
        p, w = parse_weighted_prompt("a:xyz b")
        assert w[0] == 1.0

    def test_empty(self):
        assert parse_weighted_prompt("") == ([], [])


class TestMaskDSL:
    def test_left_third_valid(self):
        m = make_mask("left_third_valid", 6, 9)
        assert m.shape == (6, 9)
        np.testing.assert_array_equal(m[:, :3], 1.0)
        np.testing.assert_array_equal(m[:, 3:], 0.0)

    def test_right_half(self):
        m = make_mask("right_half_valid", 4, 8)
        np.testing.assert_array_equal(m[:, 4:], 1.0)
        np.testing.assert_array_equal(m[:, :4], 0.0)

    def test_top_quarter_hidden(self):
        m = make_mask("top_quarter_hidden", 8, 4)
        np.testing.assert_array_equal(m[:2], 0.0)  # top quarter suppressed
        np.testing.assert_array_equal(m[2:], 1.0)

    def test_bottom_abbrev(self):
        m = make_mask("b_half_v", 4, 4)
        np.testing.assert_array_equal(m[2:], 1.0)
        np.testing.assert_array_equal(m[:2], 0.0)

    def test_perspective(self):
        m = make_mask("perspective", 8, 8)
        assert m.shape == (8, 8)
        assert m[0, 0] == 1.0 and m[7, 7] == 1.0 and m[0, 7] == 1.0

    def test_bad_inputs(self):
        with pytest.raises(ValueError):
            make_mask("middle_half_valid", 4, 4)
        with pytest.raises(ValueError):
            make_mask("left_eleventh_valid", 4, 4)


class TestScheduleGrammar:
    """The reference's doctest table (transforms.py:686-709) verbatim."""

    CASES = [
        ("test", [[10, "test"]]),
        ("a [b:3]", [[3, "a "], [10, "a b"]]),
        ("a [b: 3]", [[3, "a "], [10, "a b"]]),
        ("a [[[b]]:2]", [[2, "a "], [10, "a [[b]]"]]),
        ("[(a:2):3]", [[3, ""], [10, "(a:2)"]]),
        ("a [b : c : 1] d", [[1, "a b  d"], [10, "a  c  d"]]),
        ("a[b:[c:d:2]:1]e", [[1, "abe"], [2, "ace"], [10, "ade"]]),
        ("a [unbalanced", [[10, "a [unbalanced"]]),
        ("a [b:.5] c", [[5, "a  c"], [10, "a b c"]]),
        # the reference's docstring claims [[5,'a  c'],[10,'a {b|d{ c']] but
        # its own grammar raises on this input and degrades to constant
        # (transforms.py:749-753) — we match actual behavior:
        ("a [{b|d{:.5] c", [[10, "a [{b|d{:.5] c"]]),
        ("((a][:b:c [d:3]", [[3, "((a][:b:c "], [10, "((a][:b:c d"]]),
    ]

    @pytest.mark.parametrize("prompt,expected", CASES)
    def test_doctest_cases(self, prompt, expected):
        assert expand_schedule(prompt, 10) == expected

    def test_alternate(self):
        sched = expand_schedule("[cow|horse] field", 4)
        assert sched == [
            [1, "cow field"],
            [2, "horse field"],
            [3, "cow field"],
            [4, "horse field"],
        ]


class TestInterp:
    def test_slerp_endpoints(self):
        rng = np.random.default_rng(0)
        a, b = rng.normal(size=(4, 8)), rng.normal(size=(4, 8))
        np.testing.assert_allclose(slerp(a, b, 0.0), np.clip(a, *_rng_range(a, b)), atol=1e-12)
        np.testing.assert_allclose(slerp(a, b, 1.0), np.clip(b, *_rng_range(a, b)), atol=1e-9)

    def test_slerp_threshold_fallback_is_lerp(self):
        a = np.ones((3, 3))
        b = np.ones((3, 3)) * 1.0001  # nearly parallel -> dot ~ 1 > threshold
        out = slerp(a, b, 0.5, threshold=0.9995)
        np.testing.assert_allclose(out, lerp(a, b, 0.5), atol=1e-12)

    def test_lerp_clips_to_joint_range(self):
        a = np.array([[0.0, 1.0]])
        b = np.array([[2.0, 3.0]])
        out = lerp(a, b, 0.5)
        assert out.min() >= 0.0 and out.max() <= 3.0

    def test_plerp_interpolates_keypoints(self):
        xp = np.array([[0.0, 1.0, 2.0]])
        yp = np.array([[0.0, 10.0, 0.0]])
        assert plerp(xp, yp, 0.5)[0, 0] == pytest.approx(5.0)
        assert plerp(xp, yp, 1.5)[0, 0] == pytest.approx(5.0)
        # extrapolation uses the outermost segment
        assert plerp(xp, yp, 3.0)[0, 0] == pytest.approx(-10.0)

    def test_bleed_smears_down(self):
        x = np.zeros((10, 10))
        x[2, 5] = 1.0
        out = bleed(x)
        assert out[2, 5] == pytest.approx(1.0)
        assert out[3, 5] == pytest.approx(0.4)  # smeared downward
        assert out[1, 5] == pytest.approx(0.0)  # nothing above
        assert out[9, 5] == pytest.approx(0.025)  # tail of the smear


class TestTokenizer:
    def test_hash_tokenizer_contract(self):
        tok = HashTokenizer()
        out = tok(["hello world", "a"])
        assert out.shape == (2, 77)
        assert out[0, 0] == tok.bos_id
        assert tok.eos_id in out[0]
        # deterministic
        np.testing.assert_array_equal(out, tok(["hello world", "a"]))
        # eos-padding (SD1 convention)
        assert out[1, -1] == tok.eos_id

    def test_truncation(self):
        tok = HashTokenizer()
        out = tok("word " * 200)
        assert out.shape == (1, 77)


class TestCompose:
    def _bundle(self):
        from complex_prompt_diffusion_tpu.pipeline import ModelBundle

        return ModelBundle.random("tiny")

    def test_complex_prompt_spec(self):
        b = self._bundle()
        p = ComplexPrompt("a cat", negative_prompt="ugly", scale=1.5, bundle=b)
        spec = p.build_spec(8, 8)
        assert spec.factors.shape == (1, 77, 64)
        assert float(spec.scales[0]) == 1.5

    def test_compositional_spec(self):
        b = self._bundle()
        p = CompositionalPrompt("a forest", bundle=b)
        p.add_conjunction("a river", scale=0.8)
        p.add_filter("fog", strength=-0.5)  # negative -> negation
        p.add_masked_filter("a sun", "left_half_valid", strength=0.7)
        spec = p.build_spec(8, 8)
        assert spec.factors.shape == (4, 77, 64)
        np.testing.assert_allclose(
            np.asarray(spec.scales), [1.0, 0.8, 0.7, -0.5], atol=1e-6
        )
        assert spec.masks.shape == (4, 8, 8, 1)
        # the masked factor only covers the left half
        np.testing.assert_array_equal(np.asarray(spec.masks[2, :, 4:, 0]), 0.0)

    def test_weighted_prompt_blend(self):
        b = self._bundle()
        p = WeightedPrompt("a cat:3.0 a dog:1.0", bundle=b)
        emb = p.cond_embedding()
        e_cat = ComplexPrompt("a cat", bundle=b).cond_embedding()
        e_dog = ComplexPrompt("a dog", bundle=b).cond_embedding()
        np.testing.assert_allclose(
            emb, 0.75 * e_cat + 0.25 * e_dog, atol=1e-5
        )

    def test_json_roundtrip(self):
        b = self._bundle()
        p = CompositionalPrompt("a forest", negative_prompt="blurry", scale=2.0, bundle=b)
        p.add_conjunction("a river", scale=0.8)
        p.add_negation("fog", scale=0.5, mask="top_half_hidden")
        data = p.to_json()
        p2 = prompt_from_json(data, bundle=b)
        assert isinstance(p2, CompositionalPrompt)
        assert p2.prompt == "a forest"
        assert p2.scale == 2.0
        assert len(p2._conjunctions) == 1 and len(p2._negations) == 1
        assert p2._negations[0].mask == "top_half_hidden"
        spec1 = p.build_spec(4, 4)
        spec2 = p2.build_spec(4, 4)
        np.testing.assert_allclose(
            np.asarray(spec1.factors), np.asarray(spec2.factors), atol=1e-6
        )

    def test_prompt_lerp_path(self):
        b = self._bundle()
        p = ComplexPrompt("a cat", bundle=b)
        p.add_prompt_lerp("a dog", magnitude=1.0, lerp_keys=["magnitude"])
        path = p.embedding_path(steps=3)
        assert len(path) == 3
        # path moves monotonically toward the target region
        start = p.cond_embedding()
        assert not np.allclose(path[0], path[-1])
        assert np.linalg.norm(path[0] - start) < np.linalg.norm(path[-1] - start)


def _rng_range(a, b):
    return min(a.min(), b.min()), max(a.max(), b.max())
