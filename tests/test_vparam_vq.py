"""v-parameterization sampling + VQ first-stage tests."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.models import vae as V
from complex_prompt_diffusion_tpu.pipeline import ModelBundle, RenderConfig, txt2img


class TestVParam:
    def test_v_model_samples(self):
        b = ModelBundle.random("tiny")
        b = dataclasses.replace(b, parameterization="v")
        cfg = RenderConfig(steps=3, width=32, height=32)
        _, lat = txt2img(b, "a cat", cfg=cfg, decode=False)
        assert np.isfinite(np.asarray(lat)).all()

    def test_v_differs_from_eps(self):
        b_eps = ModelBundle.random("tiny")
        b_v = dataclasses.replace(b_eps, parameterization="v", _jit_cache={})
        cfg = RenderConfig(steps=3, width=32, height=32)
        _, lat_e = txt2img(b_eps, "a cat", cfg=cfg, decode=False)
        _, lat_v = txt2img(b_v, "a cat", cfg=cfg, decode=False)
        assert not np.allclose(np.asarray(lat_e), np.asarray(lat_v))

    def test_v_sigma_family(self):
        b = ModelBundle.random("tiny")
        b = dataclasses.replace(b, parameterization="v")
        cfg = RenderConfig(steps=3, width=32, height=32, sampler="Euler")
        _, lat = txt2img(b, "a cat", cfg=cfg, decode=False)
        assert np.isfinite(np.asarray(lat)).all()


class TestVQModel:
    def test_quantize_roundtrip(self):
        qp = V.init_vq_quantizer(jax.random.PRNGKey(0), n_embed=64, embed_dim=4)
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4)) * 0.01
        z_q, loss, idx = V.vq_quantize(qp, z)
        assert z_q.shape == z.shape
        assert idx.shape == (1, 4, 4)
        assert float(loss) >= 0
        # quantized values are codebook entries (up to straight-through)
        codes = np.asarray(qp["embedding"])
        flat = np.asarray(z + jax.lax.stop_gradient(z_q - z)).reshape(-1, 4)
        idx_flat = np.asarray(idx).reshape(-1)
        np.testing.assert_allclose(flat, codes[idx_flat], atol=1e-6)

    def test_vq_encode_decode(self):
        cfg = M.VAEConfig.tiny()
        params = V.init_vq_model(jax.random.PRNGKey(0), cfg, n_embed=128)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        z_q, loss, idx = V.vq_encode(cfg, params, x)
        assert z_q.shape[1:] == (16, 16, 4)
        img = V.vq_decode(cfg, params, z_q)
        assert img.shape == (1, 32, 32, 3)
        assert np.isfinite(np.asarray(img)).all()

    def test_straight_through_grads(self):
        qp = V.init_vq_quantizer(jax.random.PRNGKey(0), 64, 4)

        def loss_fn(z):
            z_q, _, _ = V.vq_quantize(qp, z)
            return jnp.sum(z_q**2)

        g = jax.grad(loss_fn)(jnp.ones((1, 2, 2, 4)) * 0.01)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0  # gradients pass through


class TestTiledVAE:
    def test_tiled_decode_matches_full(self):
        from complex_prompt_diffusion_tpu.models.vae import (
            vae_decode,
            vae_decode_tiled,
        )

        cfg = M.VAEConfig.tiny()
        params = M.init_vae(jax.random.PRNGKey(0), cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 24, 4)) * 0.5
        full = vae_decode(cfg, params, z)
        tiled = vae_decode_tiled(cfg, params, z, tile=16, overlap=8)
        assert tiled.shape == full.shape
        # interior matches closely; borders of tiles may differ slightly
        diff = np.abs(np.asarray(tiled) - np.asarray(full))
        assert np.median(diff) < 0.05
        assert np.isfinite(np.asarray(tiled)).all()

    def test_tiled_encode_matches_full_mean(self):
        from complex_prompt_diffusion_tpu.models.vae import (
            vae_encode,
            vae_encode_tiled,
        )

        cfg = M.VAEConfig.tiny()
        params = M.init_vae(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 48, 3))
        full = vae_encode(cfg, params, x).mean
        tiled = vae_encode_tiled(cfg, params, x, tile=32, overlap=16).mean
        assert tiled.shape == full.shape
        diff = np.abs(np.asarray(tiled) - np.asarray(full))
        assert np.median(diff) < 0.1

    def test_small_input_passthrough(self):
        from complex_prompt_diffusion_tpu.models.vae import vae_decode, vae_decode_tiled

        cfg = M.VAEConfig.tiny()
        params = M.init_vae(jax.random.PRNGKey(0), cfg)
        z = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
        np.testing.assert_allclose(
            np.asarray(vae_decode_tiled(cfg, params, z, tile=64)),
            np.asarray(vae_decode(cfg, params, z)),
            atol=1e-6,
        )


class TestHypernetwork:
    def test_hyper_kv_changes_output(self):
        import dataclasses

        from complex_prompt_diffusion_tpu.models.params import attach_hypernetwork

        cfg = dataclasses.replace(M.UNetConfig.tiny(context_dim=64), dtype="float32")
        params = M.init_unet(jax.random.PRNGKey(0), cfg)
        # de-zero the zero-initialized output convs so attention deltas
        # propagate (fresh random UNets have zero proj_out)
        rng = np.random.default_rng(0)

        def dezero(a):
            arr = np.asarray(a)
            if arr.ndim >= 2 and not arr.any():
                return jnp.asarray(rng.normal(size=arr.shape).astype(np.float32) * 0.02)
            return a

        params = jax.tree.map(dezero, params)

        def lin(i, o):
            return {
                "kernel": rng.normal(size=(i, o)).astype(np.float32) * 0.05,
                "bias": np.zeros(o, np.float32),
            }

        hyper = {
            64: {
                "k": {"linear1": lin(64, 128), "linear2": lin(128, 64)},
                "v": {"linear1": lin(64, 128), "linear2": lin(128, 64)},
            }
        }
        hp = attach_hypernetwork(params, hyper, multiplier=1.0)

        x = jnp.ones((1, 16, 16, 4))
        t = jnp.asarray([5.0])
        c = jnp.ones((1, 7, 64))
        out0 = M.unet_apply(cfg, params, x, t, c)
        out1 = M.unet_apply(cfg, hp, x, t, c)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))

    def test_flat_key_layout(self):
        from complex_prompt_diffusion_tpu.models.params import attach_hypernetwork

        import dataclasses

        cfg = dataclasses.replace(M.UNetConfig.tiny(context_dim=64), dtype="float32")
        params = M.init_unet(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(1)
        flat = {
            "64.k.linear1.weight": rng.normal(size=(128, 64)).astype(np.float32),
            "64.k.linear1.bias": np.zeros(128, np.float32),
            "64.k.linear2.weight": rng.normal(size=(64, 128)).astype(np.float32),
            "64.k.linear2.bias": np.zeros(64, np.float32),
        }
        hp = attach_hypernetwork(params, flat)
        blk = hp["input_blocks"][1][1]["blocks"][0]["attn2"]
        assert "hyper_k" in blk and "hyper_v" not in blk
        assert blk["hyper_k"]["linear1"]["kernel"].shape == (64, 128)
