"""Bundle save/load + depth2img + animation loop tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu.pipeline import (
    ModelBundle,
    RenderConfig,
    depth2img,
    load_bundle,
    render_config_from_json,
    render_config_to_json,
    save_bundle,
    txt2img,
)


@pytest.fixture(scope="module")
def bundle():
    return ModelBundle.random("tiny")


class TestPersistence:
    def test_bundle_roundtrip(self, bundle, tmp_path):
        path = str(tmp_path / "bundle")
        save_bundle(bundle, path)
        loaded = load_bundle(path)
        assert loaded.unet_cfg == bundle.unet_cfg
        cfg = RenderConfig(steps=2, width=32, height=32)
        _, a = txt2img(bundle, "a cat", cfg=cfg, decode=False)
        _, b = txt2img(loaded, "a cat", cfg=cfg, decode=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_render_config_json(self):
        from complex_prompt_diffusion_tpu.guidance import GuidanceConfig

        cfg = RenderConfig(
            steps=7, sampler="Euler", width=256,
            guidance=GuidanceConfig(guidance_scale=9.0, uc_blur=True),
        )
        data = render_config_to_json(cfg)
        back = render_config_from_json(data)
        assert back == cfg

    def test_guidance_scale_shortcut(self):
        cfg = RenderConfig(guidance_scale=9.0)
        assert cfg.guidance.guidance_scale == 9.0


class TestDepth2Img:
    def test_depth2img_runs(self):
        import dataclasses

        from complex_prompt_diffusion_tpu import models as M

        unet_cfg = dataclasses.replace(
            M.UNetConfig.tiny(context_dim=64), in_channels=5, dtype="float32"
        )
        b = ModelBundle.random("tiny")
        import jax

        b = dataclasses.replace(
            b, unet_cfg=unet_cfg,
            unet_params=M.init_unet(jax.random.PRNGKey(1), unet_cfg),
        )
        img = np.random.default_rng(0).integers(0, 255, (8, 8, 3), np.uint8)
        out, lat = depth2img(
            b, img, "a mountain", cfg=RenderConfig(steps=3, width=32, height=32)
        )
        assert np.isfinite(np.asarray(lat)).all()


class TestAnimationLoop:
    def test_two_frames_with_warps(self, bundle):
        from complex_prompt_diffusion_tpu.animation import AnimArgs, render_animation
        from complex_prompt_diffusion_tpu.prompts import ComplexPrompt

        cfg = RenderConfig(steps=2, width=32, height=32, denoising_strength=0.5)
        # tiny VAE decodes 4x4 latents to 8x8 frames
        args = AnimArgs(w=8, h=8, max_frames=4, zoom="0: (1.05)", angle="0: (2)")
        prompt = ComplexPrompt("a corridor", bundle=bundle)
        frames = render_animation(
            bundle, lambda i: prompt, cfg, args, n_frames=2, seed=3
        )
        assert len(frames) == 2
        assert frames[0].shape == (8, 8, 3)


class TestMakeItFit:
    """make_it_fit surgery vs a direct transcription of the reference's
    per-element loop (ddpm.py:245-287)."""

    @staticmethod
    def _reference_fit(old, new_shape):
        import numpy as np

        new = np.zeros(new_shape, old.dtype)
        if old.ndim == 1:
            for i in range(new_shape[0]):
                new[i] = old[i % old.shape[0]]
            return new
        for i in range(new_shape[0]):
            for j in range(new_shape[1]):
                new[i, j] = old[i % old.shape[0], j % old.shape[1]]
        n_used_old = np.ones(old.shape[1])
        for j in range(new_shape[1]):
            n_used_old[j % old.shape[1]] += 1
        n_used_new = np.zeros(new_shape[1])
        for j in range(new_shape[1]):
            n_used_new[j] = n_used_old[j % old.shape[1]]
        n_used_new = n_used_new.reshape((1, -1) + (1,) * (old.ndim - 2))
        return new / n_used_new

    def test_matches_reference_loop(self):
        from complex_prompt_diffusion_tpu.models.params import make_it_fit

        rng = np.random.default_rng(0)
        cases = {
            "w2d": (rng.normal(size=(2, 3)), (4, 5)),
            "conv": (rng.normal(size=(4, 2, 3, 3)), (6, 5, 3, 3)),
            "bias": (rng.normal(size=(3,)), (7,)),
            "out_only": (rng.normal(size=(2, 3)), (5, 3)),
            "same": (rng.normal(size=(2, 2)), (2, 2)),
        }
        sd = {k: v for k, (v, _) in cases.items()}
        shapes = {k: s for k, (_, s) in cases.items()}
        fitted = make_it_fit(sd, shapes)
        for k, (old, want) in cases.items():
            if old.shape == want:
                np.testing.assert_array_equal(fitted[k], old)
            else:
                np.testing.assert_allclose(
                    fitted[k], self._reference_fit(old, want), rtol=1e-12
                )
                assert fitted[k].shape == want

    def test_inpaint_conv_seed(self):
        # the motivating case: 4->9 channel input conv for an inpaint UNet
        from complex_prompt_diffusion_tpu.models.params import make_it_fit

        old = np.random.default_rng(1).normal(size=(320, 4, 3, 3)).astype(np.float32)
        fitted = make_it_fit(
            {"input.weight": old}, {"input.weight": (320, 9, 3, 3)}
        )["input.weight"]
        assert fitted.shape == (320, 9, 3, 3)
        assert np.isfinite(fitted).all()

    def test_rank_mismatch_rejected(self):
        from complex_prompt_diffusion_tpu.models.params import make_it_fit

        with pytest.raises(ValueError, match="rank mismatch"):
            make_it_fit({"w": np.zeros((2, 2))}, {"w": (2, 2, 2)})

    def test_trailing_axes_rejected(self):
        from complex_prompt_diffusion_tpu.models.params import make_it_fit

        with pytest.raises(ValueError, match="trailing"):
            make_it_fit({"w": np.zeros((2, 2, 3, 3))}, {"w": (4, 2, 5, 5)})


class TestCastFootprint:
    """ADVICE r4: donating cast for the load-then-cast-once path, and the
    host-side dtype cast in from_checkpoint."""

    def test_cast_donate(self):
        from complex_prompt_diffusion_tpu.pipeline import ModelBundle

        b = ModelBundle.random("tiny")
        bb = b.cast("bfloat16", donate=True).cast_vae("bfloat16", donate=True)
        assert bb.unet_cfg.dtype == "bfloat16"
        leaf = jax.tree.leaves(bb.unet_params)[0]
        assert leaf.dtype == jnp.bfloat16
        cfg = RenderConfig(steps=2, width=32, height=32)
        _, lat = txt2img(bb, "a cat", cfg=cfg, decode=False)
        assert np.isfinite(np.asarray(lat)).all()
