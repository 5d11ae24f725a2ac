"""Host-side auxiliary-subsystem tests: noise, depth, animation keyframes,
warps, metrics, YAML config, utils."""

import numpy as np
import pytest

from complex_prompt_diffusion_tpu import animation as A
from complex_prompt_diffusion_tpu import depth as D
from complex_prompt_diffusion_tpu import noise as N
from complex_prompt_diffusion_tpu.utils import metrics as MET
from complex_prompt_diffusion_tpu.utils.misc import Map, seed_everything


class TestNoiseGenerator:
    def test_iter_mode(self):
        g = N.NoiseGenerator((2, 2), seed=10, seed_mode="iter")
        a = g.sample()
        assert g.last_seed == 11
        b = g.sample()
        assert g.last_seed == 12
        assert not np.allclose(a, b)

    def test_constant_mode(self):
        g = N.NoiseGenerator((4,), seed=7, seed_mode="constant")
        np.testing.assert_array_equal(g.sample(), g.sample())

    def test_loop_mode(self):
        g = N.NoiseGenerator((4,), seed_mode="loop", cycle_size=3)
        seeds = [g.seed for _ in range(5)]
        assert seeds == [1, 2, -2, -1, 1]  # build_cycle_mod(3) = [1, 2, -2, -1]

    def test_exemplar_sequence(self):
        g = N.NoiseGenerator((4,), seed_mode="constant")
        g.add_exemplar(np.zeros(4), seed=1, uid="u")
        g.add_exemplar(np.zeros(4), seed=2, uid="u")
        a = g.sample_sequence("u")
        b = g.sample_sequence("u")
        c = g.sample_sequence("u")  # wraps around
        np.testing.assert_array_equal(a, c)
        assert not np.allclose(a, b)
        g.clear_exemplars("u")
        with pytest.raises(KeyError):
            g.sample_sequence("u")

    def test_matched_noise_outpaint(self):
        rng = np.random.default_rng(0)
        src = rng.random((32, 32, 3))
        mask = np.zeros((32, 32, 3))
        mask[:, 16:] = 1.0  # outpaint the right half
        out = N.get_matched_noise(src, mask, noise_q=1.0, color_variation=0.05)
        assert out.shape == src.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        # unmasked region preserved
        np.testing.assert_allclose(out[:, :16], src[:, :16], atol=1e-9)
        # masked region filled with something non-constant
        assert out[:, 16:].std() > 0.01


class TestDepth:
    def test_sobel_estimator_shape(self):
        img = np.random.default_rng(0).integers(0, 255, (64, 48, 3), np.uint8)
        d = D.SobelDepthEstimator().estimate(img)
        assert d.shape == (64, 48)

    def test_create_depth_mask_range(self):
        d = np.linspace(0, 10, 64 * 64).reshape(64, 64)
        m = D.create_depth_mask(d, size=(8, 8))
        assert m.shape == (8, 8)
        assert m.min() == pytest.approx(-1, abs=1e-5)
        assert m.max() == pytest.approx(1, abs=1e-5)

    def test_build_depth_mask(self):
        img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), np.uint8)
        m = D.build_depth_mask(img, q=0.35, size=(8, 8))
        assert m.shape == (8, 8)
        assert m.min() >= 0.0 and m.max() == pytest.approx(1.0, abs=1e-6)
        # the shave zeroed the lowest quantile
        assert (m == 0).sum() > 0

    def test_depth_manager_channel(self):
        mgr = D.DepthManager(size=(8, 8))
        img = np.random.default_rng(2).integers(0, 255, (64, 64, 3), np.uint8)
        ch = mgr.conditioning_channel(img)
        assert ch.shape == (8, 8, 1)

    def test_adabins_adapter_resize_contract(self):
        # fake InferenceHelper records the resized input and returns a
        # synthetic depth; verifies the reference's area clamp
        # (/root/reference/cpd/depth.py:92-117) and the resize-back
        class FakeHelper:
            def __init__(self):
                self.seen = []

            def predict_pil(self, pil):
                self.seen.append(pil.size)
                w, h = pil.size
                d = np.linspace(0, 1, h * w, dtype=np.float32).reshape(1, 1, h, w)
                return None, d

        helper = FakeHelper()
        est = D.AdaBinsEstimator(model=helper)
        # large image: area 1024*1024 > 500000 -> downscaled for the model
        big = np.zeros((1024, 1024, 3), np.uint8)
        d = est.estimate(big)
        assert d.shape == (1024, 1024)
        w, h = helper.seen[-1]
        assert w * h <= D.AdaBinsEstimator.MAX_AREA
        # small image: area < 448^2 -> upscaled for the model
        small = np.zeros((64, 64, 3), np.uint8)
        d = est.estimate(small)
        assert d.shape == (64, 64)
        w, h = helper.seen[-1]
        assert w * h >= D.AdaBinsEstimator.MIN_AREA
        # in-range image passes through unresized
        mid = np.zeros((640, 640, 3), np.uint8)
        est.estimate(mid)
        assert helper.seen[-1] == (640, 640)

    def test_leres_adapter_normalization(self):
        import torch

        captured = {}

        class FakeLeres:
            def inference(self, chw):
                captured["input"] = chw.numpy()
                return torch.from_numpy(
                    np.linspace(0, 1, 448 * 448, dtype=np.float32).reshape(
                        1, 1, 448, 448
                    )
                )

        est = D.LeResEstimator(model=FakeLeres())
        img = np.full((100, 80, 3), 128, np.uint8)
        d = est.estimate(img)
        assert d.shape == (100, 80)
        x = captured["input"]
        assert x.shape == (1, 3, 448, 448)
        # constant 128/255 image, ImageNet-normalized per channel
        expect = (128 / 255.0 - np.array(D.LeResEstimator.IMAGENET_MEAN)) / (
            np.array(D.LeResEstimator.IMAGENET_STD)
        )
        np.testing.assert_allclose(x[0, :, 0, 0], expect, atol=1e-4)

    def test_blend_path_with_adapter_estimators(self):
        # midas_weight blend through get_depth (depth.py:189-198) with
        # fake estimators standing in for MiDaS + AdaBins
        class Const:
            def __init__(self, v):
                self.v = v

            def estimate(self, img):
                return np.full(img.shape[:2], self.v, np.float32)

        img = np.zeros((16, 16, 3), np.uint8)
        out = D.get_depth(img, (Const(1.0), Const(3.0)), weights=(0.25, 0.75))
        np.testing.assert_allclose(out, 2.5)

    def test_merge_depth_blend(self):
        rng = np.random.default_rng(3)
        low = rng.random((32, 32))
        high = rng.random((64, 64))
        merged = D.merge_depth(low, high, merge_size=64)
        assert merged.shape == (64, 64)
        assert merged.min() >= 0 and merged.max() <= 1

    def test_double_estimate(self):
        img = np.random.default_rng(4).integers(0, 255, (64, 64, 3), np.uint8)
        est = D.SobelDepthEstimator()
        out = D.double_estimate(img, est, 32, 64, merge_size=64)
        assert out.shape == (64, 64)

    def test_generate_patches_finds_dense_regions(self):
        # flat image with one textured quadrant -> patches live there
        rng = np.random.default_rng(5)
        img = np.full((128, 128, 3), 0.5, np.float32)
        img[:64, :64] = rng.random((64, 64, 3))
        patches = D.generate_patches(img, base_size=48)
        assert patches, "expected at least one patch"
        for x, y, w, h in patches:
            assert w > 0 and h > 0
        # densest patch overlaps the textured quadrant
        x, y, w, h = patches[0]
        assert x < 64 and y < 64
        # sorted biggest-first (generatepatchs, depth.py:591-594)
        sizes = [p[2] for p in patches]
        assert sizes == sorted(sizes, reverse=True)

    def test_integral_rect_sum(self):
        rng = np.random.default_rng(6)
        a = rng.random((20, 30))
        integ = D._integral(a)
        rect = [5, 3, 12, 9]  # x, y, w, h
        np.testing.assert_allclose(
            D._rect_sum(integ, rect), a[3:12, 5:17].sum(), rtol=1e-10
        )

    def test_processing_res_search(self):
        rng = np.random.default_rng(8)
        img = np.full((256, 256, 3), 0.5, np.float32)
        img[64:192, 64:192] = rng.random((128, 128, 3))
        size, k = D.calculate_processing_res(img, base_size=64, whole_size_threshold=512)
        assert size % 32 == 0 and 64 <= size <= 512
        assert 0.0 <= k <= 1.0
        # fully textured image supports a larger working resolution
        full = rng.random((256, 256, 3)).astype(np.float32)
        size_full, _ = D.calculate_processing_res(full, base_size=64, whole_size_threshold=512)
        assert size_full >= size

    def test_boost_depth_auto_res(self):
        rng = np.random.default_rng(9)
        img = rng.random((96, 96, 3)).astype(np.float32)
        out = D.boost_depth(img, D.SobelDepthEstimator(), base_size=32,
                            max_patches=2, auto_res=True)
        assert out.shape == (96, 96)
        assert np.isfinite(out).all()

    def test_boost_depth(self):
        rng = np.random.default_rng(7)
        img = rng.random((96, 96, 3)).astype(np.float32)
        est = D.SobelDepthEstimator()
        out = D.boost_depth(img, est, base_size=32, max_patches=4)
        assert out.shape == (96, 96)
        assert out.min() >= 0 and out.max() <= 1
        assert np.isfinite(out).all()


class TestAnimation:
    def test_parse_key_frames(self):
        frames = A.parse_key_frames("0: (0.5), 60: (1.0)")
        assert frames == {0: "0.5", 60: "1.0"}
        with pytest.raises(RuntimeError):
            A.parse_key_frames("not a keyframe string")

    def test_interpolation_linear(self):
        series = A.build_key_frames("0: (0.0), 10: (1.0)", 11)
        np.testing.assert_allclose(series, np.linspace(0, 1, 11))

    def test_interpolation_holds_ends(self):
        series = A.build_key_frames("5: (2.0)", 10)
        np.testing.assert_allclose(series, 2.0)

    def test_keyframes_all_series(self):
        args = A.AnimArgs(max_frames=10, zoom="0: (1.0), 9: (2.0)")
        keys = A.KeyFrames(args)
        assert keys.zoom_series[9] == pytest.approx(2.0)
        assert len(keys.angle_series) == 10

    def test_2d_warp_identity(self):
        args = A.AnimArgs(w=32, h=32, max_frames=2)
        keys = A.KeyFrames(args)
        img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
        out = A.do_2d_animation_step(img, 0, keys, args)
        np.testing.assert_array_equal(out, img)  # all-zero transforms

    def test_2d_warp_zoom_changes_image(self):
        args = A.AnimArgs(w=32, h=32, max_frames=2, zoom="0: (1.5)")
        keys = A.KeyFrames(args)
        img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
        out = A.do_2d_animation_step(img, 0, keys, args)
        assert not np.array_equal(out, img)

    def test_3d_warp_translation(self):
        args = A.AnimArgs(
            w=16, h=16, max_frames=2, translation_x="0: (10.0)",
            depth_map=np.full((16, 16), 3.0),
        )
        keys = A.KeyFrames(args)
        img = np.random.default_rng(1).integers(0, 255, (16, 16, 3), np.uint8)
        out = A.do_3d_animation_step(img, 0, keys, args)
        assert out.shape == img.shape
        assert not np.array_equal(out, img)

    def test_match_colors(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 128, (16, 16, 3), np.uint8)
        b = rng.integers(128, 255, (16, 16, 3), np.uint8)
        out = A.match_colors(a, b)
        assert out.shape == a.shape
        assert out.mean() > a.mean()  # pulled toward the brighter reference


class TestMetrics:
    def test_spherical(self):
        x = np.array([[1.0, 0.0]])
        assert MET.spherical_dist(x, x)[0] == pytest.approx(0.0)
        y = np.array([[0.0, 1.0]])
        # orthogonal unit vectors: 2*arcsin(sqrt(2)/2)^2 = pi^2/8
        assert MET.spherical_dist(x, y)[0] == pytest.approx(np.pi**2 / 8)

    def test_cosine(self):
        x = np.array([[1.0, 0.0]])
        y = np.array([[1.0, 1.0]])
        assert MET.cosine_sim(x, y)[0] == pytest.approx(1 / np.sqrt(2))


class TestConfigYaml:
    def test_sd15_yaml_parses(self):
        from complex_prompt_diffusion_tpu.config import (
            load_yaml_config,
            unet_config_from_yaml,
            vae_config_from_yaml,
        )

        conf = load_yaml_config("/root/reference/cpd/config/config-1.49.yaml")
        unet_cfg = unet_config_from_yaml(
            conf["model"]["params"]["unet_config"]["params"]
        )
        assert unet_cfg.model_channels == 320
        assert unet_cfg.context_dim == 768
        assert unet_cfg.channel_mult == (1, 2, 4, 4)
        vae_cfg = vae_config_from_yaml(conf["model"]["params"]["first_stage_config"])
        assert vae_cfg.ch == 128 and vae_cfg.double_z

    def test_sd21_yaml_parses(self):
        from complex_prompt_diffusion_tpu.config import (
            load_yaml_config,
            unet_config_from_yaml,
        )

        conf = load_yaml_config("/root/reference/cpd/config/v2-inference.yaml")
        unet_cfg = unet_config_from_yaml(
            conf["model"]["params"]["unet_config"]["params"]
        )
        assert unet_cfg.num_head_channels == 64
        assert unet_cfg.context_dim == 1024
        assert unet_cfg.use_linear_in_transformer

    def test_depth2img_yaml(self):
        from complex_prompt_diffusion_tpu.config import (
            load_yaml_config,
            unet_config_from_yaml,
        )

        conf = load_yaml_config(
            "/root/reference/cpd/config/v2-midas-inference.yaml"
        )
        unet_cfg = unet_config_from_yaml(
            conf["model"]["params"]["unet_config"]["params"]
        )
        assert unet_cfg.in_channels == 5  # depth channel


class TestUtils:
    def test_map(self):
        m = Map({"a": 1}, b=2)
        assert m.a == 1 and m.b == 2
        m.c = 3
        assert m["c"] == 3
        with pytest.raises(AttributeError):
            _ = m.missing

    def test_seed_everything(self):
        seed_everything(123)
        a = np.random.rand(3)
        seed_everything(123)
        b = np.random.rand(3)
        np.testing.assert_array_equal(a, b)


class TestImageMetrics:
    """psnr/ssim (utils/metrics.py round 5): analytic sanity properties —
    identity is perfect, quality degrades monotonically with noise, and
    unrelated images score near zero SSIM."""

    def test_properties(self):
        from complex_prompt_diffusion_tpu.utils.metrics import psnr, ssim

        rng = np.random.default_rng(0)
        a = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.float64)
        assert psnr(a, a) == float("inf")
        assert ssim(a, a) == pytest.approx(1.0)
        b5 = np.clip(a + rng.normal(0, 5, a.shape), 0, 255)
        b25 = np.clip(a + rng.normal(0, 25, a.shape), 0, 255)
        assert psnr(a, b5) > psnr(a, b25) > 10.0
        assert 1.0 > ssim(a, b5) > ssim(a, b25)
        c = rng.integers(0, 255, a.shape).astype(np.float64)
        assert ssim(a, c) < 0.1
        # known closed form: uniform noise sigma -> 20 log10(255/sigma)
        assert psnr(a, b5) == pytest.approx(20 * np.log10(255 / 5), abs=1.0)
