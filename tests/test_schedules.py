"""Golden-vector tests for the schedule layer.

Expected values are computed inline from the closed-form definitions (DDPM
arXiv:2006.11239, DDIM arXiv:2010.02502, Karras arXiv:2206.00364), matching
the reference formulas in /root/reference/cpd/scheduler/discrete.py.
"""

import math

import numpy as np
import pytest

from complex_prompt_diffusion_tpu import schedules as S


class TestBetaSchedules:
    def test_linear(self):
        betas = S.make_beta_schedule("linear", 10, linear_start=1e-4, linear_end=2e-2)
        np.testing.assert_allclose(betas, np.linspace(1e-4, 2e-2, 10))

    def test_scaled_linear_sd_defaults(self):
        betas = S.make_beta_schedule(
            "scaled_linear", 1000, linear_start=0.00085, linear_end=0.012
        )
        assert betas.shape == (1000,)
        assert betas[0] == pytest.approx(0.00085)
        assert betas[-1] == pytest.approx(0.012)
        # interior point: (sqrt(b0) + frac*(sqrt(b1)-sqrt(b0)))**2
        frac = 500 / 999
        expected = (
            math.sqrt(0.00085) + frac * (math.sqrt(0.012) - math.sqrt(0.00085))
        ) ** 2
        assert betas[500] == pytest.approx(expected, rel=1e-12)

    def test_quad_alias(self):
        a = S.make_beta_schedule("quad", 100)
        b = S.make_beta_schedule("scaled_linear", 100)
        np.testing.assert_array_equal(a, b)

    def test_exp(self):
        betas = S.make_beta_schedule("exp", 5, linear_start=1e-4, linear_end=1e-2)
        expected = np.exp(np.linspace(np.log(1e-4), np.log(1e-2), 5))
        np.testing.assert_allclose(betas, expected)

    def test_squaredcos_cap_v2(self):
        betas = S.make_beta_schedule("squaredcos_cap_v2", 50)
        s = 8e-3

        def ab(t):
            return math.cos((t + s) / (1 + s) * math.pi / 2) ** 2

        expected = [
            min(1 - ab((i + 1) / 50) / ab(i / 50), 0.999) for i in range(50)
        ]
        np.testing.assert_allclose(betas, expected, rtol=1e-12)
        assert np.all(betas <= 0.999)

    def test_sigmoid(self):
        betas = S.make_beta_schedule("sigmoid", 7, linear_start=1e-4, linear_end=1e-2)
        x = np.linspace(-6, 6, 7)
        expected = 1 / (1 + np.exp(-x)) * (1e-2 - 1e-4) + 1e-4
        np.testing.assert_allclose(betas, expected)

    def test_warmup(self):
        betas = S.make_beta_schedule("warmup10", 100, linear_start=1e-4, linear_end=1e-2)
        assert betas[0] == pytest.approx(1e-4)
        np.testing.assert_allclose(betas[10:], 1e-2)
        betas50 = S.make_beta_schedule("warmup50", 100, linear_start=1e-4, linear_end=1e-2)
        assert np.all(betas50[50:] == 1e-2)

    def test_const_jsd(self):
        np.testing.assert_allclose(
            S.make_beta_schedule("const", 5, linear_end=0.5), 0.5
        )
        np.testing.assert_allclose(
            S.make_beta_schedule("jsd", 4), [1 / 4, 1 / 3, 1 / 2, 0.999]  # capped
        )

    def test_cosine(self):
        n, s = 20, 8e-3
        betas = S.make_beta_schedule("cosine", n, cosine_s=s)
        ts = np.arange(n + 1) / n + s
        alphas = np.cos(ts / (1 + s) * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        expected = np.minimum(1 - alphas[1:] / alphas[:-1], 0.999)
        np.testing.assert_allclose(betas, expected, rtol=1e-12)

    def test_rounding_optin(self):
        # reference discrete.py:237 rounds to 4 decimals; opt-in here
        betas = S.make_beta_schedule(
            "scaled_linear", 10, linear_start=0.00085, linear_end=0.012,
            decimal_precision=4,
        )
        assert betas[0] == pytest.approx(0.0008)  # 0.00085 -> round -> 0.0008

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            S.make_beta_schedule("nope", 10)


class TestSigmaSchedules:
    def test_karras(self):
        sig = S.karras_sigmas(10, sigma_min=0.1, sigma_max=10.0, rho=7.0)
        assert sig[0] == pytest.approx(10.0)
        assert sig[-1] == pytest.approx(0.1)
        assert np.all(np.diff(sig) < 0)
        # closed form at midpoint
        ramp = np.linspace(0, 1, 10)[4]
        expected = (10 ** (1 / 7) + ramp * (0.1 ** (1 / 7) - 10 ** (1 / 7))) ** 7
        assert sig[4] == pytest.approx(expected, rel=1e-12)

    def test_exponential(self):
        sig = S.exponential_sigmas(5, 0.1, 10.0)
        np.testing.assert_allclose(
            np.log(sig), np.linspace(np.log(10.0), np.log(0.1), 5)
        )

    def test_quadratic(self):
        sig = S.quadratic_sigmas(5, 0.1, 10.0)
        np.testing.assert_allclose(
            sig, np.linspace(np.sqrt(10.0), np.sqrt(0.1), 5) ** 2
        )

    def test_vp(self):
        sig = S.vp_sigmas(5, beta_d=19.9, beta_min=0.1, eps_s=1e-3)
        t = np.linspace(1, 1e-3, 5)
        np.testing.assert_allclose(
            sig, np.sqrt(np.exp(19.9 * t**2 / 2 + 0.1 * t) - 1)
        )

    def test_make_appends_zero(self):
        sig = S.make_sigma_schedule("karras", 8)
        assert sig.shape == (9,)
        assert sig[-1] == 0.0

    def test_linear_uses_model_table(self):
        tables = S.make_diffusion_tables(num_train_timesteps=100)
        sig = S.make_sigma_schedule("linear", 10, model_sigmas=tables.sigmas)
        assert sig.shape == (11,)
        assert sig[0] == pytest.approx(tables.sigmas[-1])
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig) < 0)

    def test_sigma_t_roundtrip(self):
        tables = S.make_diffusion_tables(num_train_timesteps=1000)
        t = np.array([0.0, 10.5, 500.0, 998.7])
        sig = S.t_to_sigma(t, tables.sigmas)
        t_back = S.sigma_to_t(sig, tables.sigmas)
        np.testing.assert_allclose(t_back, t, atol=1e-6)

    def test_sigma_to_t_quantized(self):
        tables = S.make_diffusion_tables(num_train_timesteps=1000)
        t = S.sigma_to_t(tables.sigmas[[3, 700]], tables.sigmas, quantize=True)
        np.testing.assert_array_equal(t, [3, 700])

    def test_scalings(self):
        c_out, c_in = S.karras_scalings(np.array([0.0, 1.0, 3.0]))
        np.testing.assert_allclose(c_out, [0.0, -1.0, -3.0])
        np.testing.assert_allclose(c_in, [1.0, 1 / np.sqrt(2.0), 1 / np.sqrt(10.0)])


class TestTimesteps:
    def test_uniform_50(self):
        ts = S.make_timesteps(50, "uniform", 1000)
        assert ts.shape == (50,)
        np.testing.assert_array_equal(ts, np.arange(0, 1000, 20) + 1)

    def test_uniform_full_chain_clamps_last(self):
        ts = S.make_timesteps(1000, "uniform", 1000)
        assert ts[-1] == 999  # would be 1000 after +1; clamped (discrete.py:506)

    def test_quad(self):
        ts = S.make_timesteps(10, "quad", 1000)
        expected = (np.linspace(0, np.sqrt(800), 10) ** 2).astype(int) + 1
        np.testing.assert_array_equal(ts, expected)

    def test_jumps_walk(self):
        ts = S.jump_timesteps(20, 1000, jump_length=5, jump_n_sample=3)
        # starts by descending from 19
        assert ts[0] == 19 * 50
        # contains forward jumps (positive diffs)
        assert np.any(np.diff(ts) > 0)
        # every entry is a multiple of T//S
        assert np.all(ts % 50 == 0)


class TestDiffusionTables:
    def test_sd15_tables(self):
        t = S.make_diffusion_tables()  # SD defaults
        assert t.num_train_timesteps == 1000
        np.testing.assert_allclose(t.alphas, 1 - t.betas)
        np.testing.assert_allclose(t.alphas_cumprod, np.cumprod(1 - t.betas))
        assert t.alphas_cumprod_prev[0] == 1.0
        np.testing.assert_allclose(t.alphas_cumprod_prev[1:], t.alphas_cumprod[:-1])
        # SD-1.5 known value: alphas_cumprod[-1] ~ 0.00466
        assert t.alphas_cumprod[-1] == pytest.approx(0.0046582, rel=1e-3)
        # k-diffusion sigma_max for SD ~ 14.61
        assert t.sigmas[-1] == pytest.approx(14.6146, rel=1e-3)
        # posterior identities
        np.testing.assert_allclose(
            t.posterior_variance,
            t.betas * (1 - t.alphas_cumprod_prev) / (1 - t.alphas_cumprod),
        )
        np.testing.assert_allclose(
            t.sqrt_recipm1_alphas_cumprod,
            np.sqrt(1 / t.alphas_cumprod - 1),
        )

    def test_inference_tables_ddim50(self):
        t = S.make_diffusion_tables()
        it = S.make_inference_tables(t, 50, eta=0.0)
        assert it.num_steps == 50
        np.testing.assert_array_equal(it.timesteps, np.arange(0, 1000, 20) + 1)
        np.testing.assert_allclose(
            it.alphas_cumprod_t, t.alphas_cumprod[it.timesteps]
        )
        # prev_t[0] = alphas_cumprod[0] per reference discrete.py:474
        assert it.alphas_cumprod_prev_t[0] == t.alphas_cumprod[0]
        np.testing.assert_allclose(
            it.alphas_cumprod_prev_t[1:], it.alphas_cumprod_t[:-1]
        )
        # eta=0 -> deterministic DDIM, no step noise
        np.testing.assert_array_equal(it.sigmas_t, 0.0)

    def test_inference_tables_eta1(self):
        t = S.make_diffusion_tables()
        it = S.make_inference_tables(t, 50, eta=1.0)
        ac, acp = it.alphas_cumprod_t, it.alphas_cumprod_prev_t
        expected = np.sqrt((1 - acp) / (1 - ac) * (1 - ac / acp))
        np.testing.assert_allclose(it.sigmas_t, expected)
        assert np.all(it.sigmas_t >= 0)

    def test_tables_are_pytrees(self):
        import jax

        t = S.make_diffusion_tables(num_train_timesteps=10)
        leaves = jax.tree.leaves(t)
        assert len(leaves) == 15
        t2 = jax.tree.map(lambda a: a * 1.0, t)
        assert isinstance(t2, S.DiffusionTables)
