"""Training-loop tests: p_losses math vs the reference formulae
(ddpm.py:387-414), train-step convergence, LitEma warmup decay and the
store/copy_to/restore validation-swap scope (ema.py:5-80)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu import schedules as S
from complex_prompt_diffusion_tpu.train.loop import (
    LitEma,
    ema_scope,
    ema_update,
    get_v,
    make_train_step,
    p_losses,
    q_sample,
)


@pytest.fixture(scope="module")
def tables():
    return S.make_diffusion_tables()


class TestLosses:
    def test_q_sample_formula(self, tables):
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
        t = jnp.asarray([3, 700])
        got = q_sample(tables, x0, t, noise)
        sac = np.asarray(tables.sqrt_alphas_cumprod)[np.asarray(t)]
        s1m = np.asarray(tables.sqrt_one_minus_alphas_cumprod)[np.asarray(t)]
        want = sac[:, None, None, None] * np.asarray(x0) + s1m[
            :, None, None, None
        ] * np.asarray(noise)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-7)

    def test_v_target(self, tables):
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
        t = jnp.asarray([500])
        v = get_v(tables, x0, noise, t)
        sac = float(np.asarray(tables.sqrt_alphas_cumprod)[500])
        s1m = float(np.asarray(tables.sqrt_one_minus_alphas_cumprod)[500])
        want = sac * np.asarray(noise) - s1m * np.asarray(x0)
        np.testing.assert_allclose(np.asarray(v), want, rtol=1e-6)

    @pytest.mark.parametrize("parameterization", ["eps", "x0", "v"])
    def test_p_losses_zero_when_model_is_target(self, tables, parameterization):
        """A model that returns the exact target gives zero loss."""
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
        t = jnp.asarray([10, 900])
        target = {
            "eps": noise,
            "x0": x0,
            "v": get_v(tables, x0, noise, t),
        }[parameterization]
        loss = p_losses(
            lambda p, x, tt, c: target, None, tables, x0, None, t, noise,
            parameterization=parameterization,
        )
        assert float(loss) < 1e-10

    def test_elbo_term_adds(self, tables):
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
        t = jnp.asarray([100])
        apply = lambda p, x, tt, c: jnp.zeros_like(x)
        base = float(p_losses(apply, None, tables, x0, None, t, noise))
        with_elbo = float(
            p_losses(
                apply, None, tables, x0, None, t, noise, elbo_weight=0.5
            )
        )
        assert with_elbo > base

    def test_l1_loss(self, tables):
        rng = np.random.default_rng(4)
        x0 = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
        t = jnp.asarray([100])
        apply = lambda p, x, tt, c: jnp.zeros_like(x)
        l1 = float(
            p_losses(apply, None, tables, x0, None, t, noise, loss_type="l1")
        )
        assert l1 == pytest.approx(float(jnp.abs(noise).mean()), rel=1e-5)


class TestTrainStep:
    def test_loss_decreases(self, tables):
        cfg = M.UNetConfig.tiny(context_dim=32)
        import dataclasses

        cfg = dataclasses.replace(cfg, dtype="float32")
        params = M.init_unet(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-3)
        step = jax.jit(
            make_train_step(cfg, tables, opt), donate_argnums=(0, 1)
        )
        opt_state = opt.init(params)
        rng = np.random.default_rng(5)
        batch = {
            "latents": jnp.asarray(
                rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
            ),
            "context": jnp.asarray(
                rng.normal(size=(2, 7, 32)).astype(np.float32)
            ),
        }
        losses = []
        for i in range(8):
            params, opt_state, loss = step(
                params, opt_state, batch, jax.random.PRNGKey(7)
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        # same fixed batch/key: optimization must reduce the loss
        assert losses[-1] < losses[0]


class TestLitEma:
    def _params(self, v):
        return {"w": jnp.full((2, 2), v), "b": jnp.zeros((2,))}

    def test_warmup_decay(self):
        """ema.py:29-48: effective decay is min(decay, (1+n)/(10+n))."""
        ema = LitEma.create(self._params(0.0), decay=0.9999)
        ema = ema.update(self._params(1.0))
        # first update: n=1 -> decay 2/11
        d = 2.0 / 11.0
        np.testing.assert_allclose(
            np.asarray(ema.shadow["w"]), (1 - d) * 1.0, rtol=1e-6
        )
        assert ema.num_updates == 1

    def test_fixed_decay_when_disabled(self):
        ema = LitEma.create(self._params(0.0), decay=0.5, use_num_updates=False)
        ema = ema.update(self._params(1.0))
        np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 0.5, rtol=1e-6)

    def test_store_copy_restore(self):
        """ema.py:50-80: validate with EMA weights, then restore."""
        online = self._params(3.0)
        ema = LitEma.create(self._params(1.0), decay=0.5, use_num_updates=False)
        ema = ema.store(online)
        eval_params = ema.copy_to()
        np.testing.assert_allclose(np.asarray(eval_params["w"]), 1.0)
        restored = ema.restore()
        np.testing.assert_allclose(np.asarray(restored["w"]), 3.0)

    def test_restore_without_store_raises(self):
        ema = LitEma.create(self._params(1.0))
        with pytest.raises(ValueError, match="store"):
            ema.restore()

    def test_ema_scope(self):
        online = self._params(3.0)
        ema = LitEma.create(self._params(1.0))
        with ema_scope(online, ema) as w:
            np.testing.assert_allclose(np.asarray(w["w"]), 1.0)
        with ema_scope(online, ema, enabled=False) as w:
            np.testing.assert_allclose(np.asarray(w["w"]), 3.0)
        with ema_scope(online, None) as w:
            np.testing.assert_allclose(np.asarray(w["w"]), 3.0)

    def test_ema_update_warmup_matches_litema(self):
        p0, p1 = self._params(0.0), self._params(1.0)
        lite = LitEma.create(p0, decay=0.9999).update(p1)
        raw = ema_update(p0, p1, 0.9999, step=1)
        np.testing.assert_allclose(
            np.asarray(lite.shadow["w"]), np.asarray(raw["w"]), rtol=1e-6
        )
