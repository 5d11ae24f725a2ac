"""Tests for DPM Adaptive, log-likelihood, and blur diffusion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu import schedules as S
from complex_prompt_diffusion_tpu.samplers.blur import (
    BlurDiffusion,
    Deblurring,
    gaussian_kernel_1d,
    sample_blur,
)
from complex_prompt_diffusion_tpu.samplers.dpm_adaptive import sample_dpm_adaptive
from complex_prompt_diffusion_tpu.samplers.loglik import log_likelihood


def _den(x, s, uc):
    return x / (1.0 + s**2)


class TestDPMAdaptive:
    def test_converges_with_few_nfe(self):
        sig = S.make_sigma_schedule("karras", 50, sigma_min=0.02, sigma_max=10.0)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2))
        x_init = x0 * float(np.sqrt(1 + sig[0] ** 2))
        out, info = sample_dpm_adaptive(_den, x_init, sig)
        expected = np.asarray(x_init) / np.sqrt(1 + float(sig[0]) ** 2)
        err = np.abs(np.asarray(out) - expected).max() / np.abs(expected).max()
        assert err < 0.05
        # adaptive control: far fewer evals than a fixed 50-step chain
        assert int(info["nfe"]) < 60

    def test_order2(self):
        sig = S.make_sigma_schedule("karras", 30, sigma_min=0.05, sigma_max=8.0)
        x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 2))
        x_init = x0 * float(np.sqrt(1 + sig[0] ** 2))
        out, _ = sample_dpm_adaptive(_den, x_init, sig, order=2)
        expected = np.asarray(x_init) / np.sqrt(1 + float(sig[0]) ** 2)
        err = np.abs(np.asarray(out) - expected).max() / np.abs(expected).max()
        assert err < 0.08


class TestLogLikelihood:
    def test_gaussian_nats(self):
        # data ~ N(0, 1): true differential entropy is ~1.419 nats/dim; the
        # estimator should land in that neighborhood
        x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 2))
        ll = log_likelihood(_den, x0, 0.02, 10.0, key=jax.random.PRNGKey(2), steps=40)
        per_dim = float(ll.mean()) / (8 * 8 * 2)
        assert -1.7 < per_dim < -1.1

    def test_less_likely_samples_score_lower(self):
        x_typical = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 2))
        x_outlier = x_typical * 4.0
        ll_t = log_likelihood(_den, x_typical, 0.02, 10.0, key=jax.random.PRNGKey(4), steps=30)
        ll_o = log_likelihood(_den, x_outlier, 0.02, 10.0, key=jax.random.PRNGKey(4), steps=30)
        assert float(ll_o[0]) < float(ll_t[0])


class TestBlurDiffusion:
    def test_operator_orthonormal(self):
        deb = Deblurring(gaussian_kernel_1d(5, 1.0), 8)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        # U(Ut(x)) == x (orthonormal eigenbasis)
        rec = deb.U(deb.Ut(x))
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4)

    def test_forward_statistics(self):
        proc = BlurDiffusion(n=20, resolution=8)
        x0 = jnp.ones((1, 8, 8, 1))
        # index 0 is identity: mean == x0, std == 0... index 1 nearly so
        i = jnp.asarray([1])
        mean = proc.get_mean(x0, i)
        assert float(jnp.abs(mean).mean()) > 0.3  # early step barely blurs DC
        # increasing i decreases retained signal energy
        e_small = float(jnp.sum(proc.get_mean(x0, jnp.asarray([2])) ** 2))
        e_large = float(jnp.sum(proc.get_mean(x0, jnp.asarray([19])) ** 2))
        assert e_large < e_small

    def test_roundtrip_early_step(self):
        # exact inversion is only well-conditioned at early steps (the
        # spectral cumprod underflows later — inherent to the process)
        proc = BlurDiffusion(n=20, resolution=8)
        x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 1))
        i = jnp.asarray([1])
        xi, eps = proc.get_x_i(x0, i, jax.random.PRNGKey(3), return_eps=True)
        rec = proc.get_x0_from_eps(xi, eps, i)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-2)

    def test_sampler_runs(self):
        proc = BlurDiffusion(n=10, resolution=8)
        out = sample_blur(
            lambda x, i: jnp.zeros_like(x), proc, (1, 8, 8, 1),
            key=jax.random.PRNGKey(4),
        )
        assert np.isfinite(np.asarray(out)).all()
