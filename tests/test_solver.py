"""DPM-Solver / UniPC / RePaint tests.

Analytic fixture: for unit-Gaussian data under a VP schedule the true noise
prediction is eps(x, t) = sigma_t * x, and the probability-flow ODE is the
identity map — any correct solver must return its input (x_0 = x_T).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu import samplers as SA
from complex_prompt_diffusion_tpu import schedules as S


@pytest.fixture(scope="module")
def ns():
    tables = S.make_diffusion_tables()
    return SA.NoiseScheduleVP("discrete", alphas_cumprod=tables.alphas_cumprod)


@pytest.fixture(scope="module")
def x0():
    return jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2))


def _ideal_model(ns):
    def model_fn(x, t_cont):
        return ns.marginal_std(t_cont) * x

    return model_fn


class TestNoiseScheduleVP:
    def test_marginals_match_tables(self, ns):
        tables = S.make_diffusion_tables()
        # t = (i+1)/N maps to discrete step i
        for i in [0, 499, 999]:
            t = (i + 1) / 1000
            np.testing.assert_allclose(
                float(ns.marginal_alpha(t)),
                np.sqrt(tables.alphas_cumprod[i]),
                rtol=1e-5,
            )
            # f32 log-alpha interpolation: std loses precision where
            # 1 - alpha_cumprod is tiny (early steps)
            np.testing.assert_allclose(
                float(ns.marginal_std(t)),
                np.sqrt(1 - tables.alphas_cumprod[i]),
                rtol=2e-3,
            )

    def test_inverse_lambda_roundtrip(self, ns):
        for t in [0.05, 0.3, 0.9]:
            lam = ns.marginal_lambda(t)
            t_back = float(ns.inverse_lambda(lam))
            assert abs(t_back - t) < 1e-3

    def test_linear_schedule(self):
        lin = SA.NoiseScheduleVP("linear")
        assert float(lin.marginal_alpha(0.001)) > 0.99
        assert float(lin.marginal_std(1.0)) > 0.99


class TestDPMSolver:
    # time_uniform grids put one huge logSNR jump at the end of the SD
    # schedule; tight accuracy checks use the logSNR grid below
    @pytest.mark.parametrize("method,order,tol", [
        ("multistep", 1, 0.1),
        ("multistep", 2, 0.08),
        ("multistep", 3, 0.08),
        ("singlestep", 2, 0.05),
        ("singlestep", 3, 0.05),
    ])
    def test_identity_flow(self, ns, x0, method, order, tol):
        out = SA.sample_dpm_solver(
            _ideal_model(ns), x0, ns, steps=20, order=order, method=method
        )
        err = float(jnp.abs(out - x0).max()) / float(jnp.abs(x0).max())
        assert err < tol, f"{method} order {order}: {err}"

    def test_dpmsolver_eps_variant(self, ns, x0):
        out = SA.sample_dpm_solver(
            _ideal_model(ns), x0, ns, steps=20, order=2,
            algorithm_type="dpmsolver",
        )
        err = float(jnp.abs(out - x0).max()) / float(jnp.abs(x0).max())
        assert err < 0.05

    def test_logsnr_skip(self, ns, x0):
        out = SA.sample_dpm_solver(
            _ideal_model(ns), x0, ns, steps=15, order=2, skip_type="logSNR"
        )
        err = float(jnp.abs(out - x0).max()) / float(jnp.abs(x0).max())
        assert err < 0.02
        out3 = SA.sample_dpm_solver(
            _ideal_model(ns), x0, ns, steps=21, order=3,
            method="singlestep", skip_type="logSNR",
        )
        err3 = float(jnp.abs(out3 - x0).max()) / float(jnp.abs(x0).max())
        assert err3 < 2e-3  # 3rd order on a logSNR grid is near-exact

    def test_model_wrapper_types(self, ns):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 2))
        t = 0.5
        alpha = float(ns.marginal_alpha(t))
        sigma = float(ns.marginal_std(t))
        eps_true = sigma * x

        # model returns eps directly
        m_noise = SA.model_wrapper(lambda xx, tt, c: sigma * xx, ns, "noise")
        np.testing.assert_allclose(np.asarray(m_noise(x, t)), np.asarray(eps_true), rtol=1e-5)

        # x_start type: x0 = (x - sigma*eps)/alpha
        x0_pred = (x - sigma * eps_true) / alpha
        m_x0 = SA.model_wrapper(lambda xx, tt, c: (xx - sigma * (sigma * xx)) / alpha, ns, "x_start")
        np.testing.assert_allclose(np.asarray(m_x0(x, t)), np.asarray(eps_true), rtol=1e-4, atol=1e-5)

        # score type: score = -eps/sigma
        m_score = SA.model_wrapper(lambda xx, tt, c: -xx, ns, "score")
        np.testing.assert_allclose(np.asarray(m_score(x, t)), np.asarray(eps_true), rtol=1e-4)

    def test_classifier_free_wrapper(self, ns):
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 2))
        cond = jnp.ones((1, 3))
        uncond = jnp.zeros((1, 3))

        def model(xx, tt, c):
            # per-sample conditioning factor
            return xx * (1.0 + c.mean(axis=1).reshape(-1, 1, 1, 1))

        m = SA.model_wrapper(
            model, ns, "noise", guidance_type="classifier-free",
            guidance_scale=2.0, condition=cond, unconditional_condition=uncond,
        )
        out = m(x, 0.5)
        # uncond -> x, cond -> 2x; cfg: x + 2*(2x - x) = 3x
        np.testing.assert_allclose(np.asarray(out), np.asarray(3 * x), rtol=1e-5)


class TestUniPC:
    @pytest.mark.parametrize("order,variant,tol", [
        (1, "bh2", 0.05),
        (2, "bh2", 0.02),
        (3, "bh2", 0.02),
        (2, "bh1", 0.02),
    ])
    def test_identity_flow(self, ns, x0, order, variant, tol):
        out = SA.sample_unipc(
            _ideal_model(ns), x0, ns, steps=20, order=order, variant=variant
        )
        err = float(jnp.abs(out - x0).max()) / float(jnp.abs(x0).max())
        assert err < tol, f"unipc order {order} {variant}: {err}"

    def test_no_corrector(self, ns, x0):
        out = SA.sample_unipc(
            _ideal_model(ns), x0, ns, steps=20, order=2, use_corrector=False
        )
        err = float(jnp.abs(out - x0).max()) / float(jnp.abs(x0).max())
        assert err < 0.02


class TestRePaint:
    def test_known_region_preserved(self):
        tables = S.make_diffusion_tables()
        original = jnp.ones((1, 8, 8, 2)) * 0.5
        mask = jnp.zeros((1, 8, 8, 2)).at[:, :4].set(1.0)  # top half known

        def eps_fn(x, t, uc, blur):
            return 0.1 * x

        out = SA.sample_repaint(
            eps_fn, original, mask, tables, steps=20,
            jump_length=5, jump_n_sample=2, key=jax.random.PRNGKey(0),
        )
        assert np.isfinite(np.asarray(out)).all()
        # known region should end close to the original (final steps have
        # tiny noise levels)
        known_err = float(jnp.abs(out[:, :4] - original[:, :4]).mean())
        unknown_err = float(jnp.abs(out[:, 4:] - original[:, 4:]).mean())
        assert known_err < 0.15
        assert known_err < unknown_err


class TestUniPCVaryCoeff:
    @pytest.mark.parametrize("order,tol", [(1, 0.06), (2, 0.05), (3, 0.05)])
    def test_identity_flow(self, ns, x0, order, tol):
        out = SA.sample_unipc(
            _ideal_model(ns), x0, ns, steps=20, order=order,
            variant="vary_coeff",
        )
        err = float(jnp.abs(out - x0).max()) / float(jnp.abs(x0).max())
        assert err < tol, f"unipc vary_coeff order {order}: {err}"

    def test_differs_from_bh(self, ns, x0):
        # vary_coeff is a genuinely different update rule at order >= 2
        a = SA.sample_unipc(_ideal_model(ns), x0, ns, steps=8, order=3,
                            variant="vary_coeff")
        b = SA.sample_unipc(_ideal_model(ns), x0, ns, steps=8, order=3,
                            variant="bh2")
        assert float(jnp.abs(a - b).max()) > 1e-6


class TestUniPCOracle:
    """Trajectory parity vs the torch reference solver (uni_pc.py:183+),
    driven through its own multistep sample() loop on a shared nontrivial
    toy model."""

    @pytest.mark.parametrize("variant,order", [
        ("vary_coeff", 1), ("vary_coeff", 2), ("vary_coeff", 3),
        ("bh1", 2), ("bh2", 2), ("bh2", 3),
    ])
    def test_multistep_matches_reference(self, ns, variant, order):
        import _oracle

        ref_unipc = _oracle.setup_unipc()
        if ref_unipc is None:
            pytest.skip("reference import failed")
        import torch

        tables = S.make_diffusion_tables()
        import cpd.scheduler.noise_vp as ref_nvp

        t_ns = ref_nvp.NoiseScheduleVP(
            "discrete", alphas_cumprod=torch.tensor(
                np.asarray(tables.alphas_cumprod), dtype=torch.float32
            ),
        )

        x_np = np.asarray(
            jax.random.normal(jax.random.PRNGKey(3), (1, 2, 6, 6)), np.float32
        )

        # nontrivial model shared by both: eps = sigma_t*(x + 0.1 sin 3x)
        def ref_model(x, t_cont):
            s = t_ns.marginal_std(t_cont).reshape(-1, 1, 1, 1)
            return s * (x + 0.1 * torch.sin(3.0 * x))

        steps = 10
        solver = ref_unipc.UniPC(
            ref_model, t_ns, predict_x0=True, variant=variant
        )
        ref_out = solver.sample(
            torch.tensor(x_np), steps=steps, order=order,
            skip_type="time_uniform", method="multistep",
            lower_order_final=True,
        ).numpy()

        def my_model(x, t_cont):
            return ns.marginal_std(t_cont) * (x + 0.1 * jnp.sin(3.0 * x))

        out = np.asarray(SA.sample_unipc(
            my_model, jnp.asarray(x_np), ns, steps=steps, order=order,
            skip_type="time_uniform", variant=variant,
        ))
        np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-3)


class TestDPMSolverAdaptive:
    """Continuous-time adaptive solver (solver.py:982-1043) — identity-flow
    accuracy plus trajectory parity vs the torch reference."""

    @pytest.mark.parametrize("order", [2, 3])
    def test_identity_flow(self, ns, x0, order):
        out = SA.sample_dpm_solver(
            _ideal_model(ns), x0, ns, order=order, method="adaptive"
        )
        err = float(jnp.abs(out - x0).max()) / float(jnp.abs(x0).max())
        assert err < 0.05, f"adaptive order {order}: {err}"

    def test_order_validation(self, ns, x0):
        with pytest.raises(ValueError):
            SA.sample_dpm_solver_adaptive(_ideal_model(ns), x0, ns, order=1)

    @pytest.mark.parametrize("order,algo", [
        (2, "dpmsolver++"), (3, "dpmsolver++"), (2, "dpmsolver"),
    ])
    def test_matches_reference(self, ns, order, algo):
        import _oracle

        cpd = _oracle.setup()
        if cpd is None:
            pytest.skip("reference import failed")
        import torch
        import cpd.samplers.solver as ref_solver

        tables = S.make_diffusion_tables()
        t_ns = ref_solver.NoiseScheduleVP(
            "discrete", alphas_cumprod=torch.tensor(
                np.asarray(tables.alphas_cumprod), dtype=torch.float32
            ),
        )
        x_np = np.asarray(
            jax.random.normal(jax.random.PRNGKey(7), (2, 2, 6, 6)), np.float32
        )

        def ref_model(x, t_cont):
            s = t_ns.marginal_std(t_cont).reshape(-1, 1, 1, 1)
            return s * (x + 0.1 * torch.sin(3.0 * x))

        solver = ref_solver.DPM_Solver(
            ref_model, t_ns, predict_x0=(algo == "dpmsolver++")
        )
        ref_out = solver.sample(
            torch.tensor(x_np), order=order, method="adaptive"
        ).numpy()

        def my_model(x, t_cont):
            return ns.marginal_std(t_cont) * (x + 0.1 * jnp.sin(3.0 * x))

        out = np.asarray(SA.sample_dpm_solver_adaptive(
            my_model, jnp.asarray(x_np), ns, order=order, algorithm_type=algo,
        ))
        # adaptive control flow compounds f32 interp differences across
        # accept/reject decisions; both solutions approximate the same ODE
        np.testing.assert_allclose(out, ref_out, rtol=2e-2, atol=2e-2)
