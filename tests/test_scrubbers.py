"""Scrubber-family unit tests: streaming updates vs direct recomputation,
forgetting-factor walks, gradient reversal, MI estimator vs naive numpy."""

import jax
import jax.numpy as jnp
import numpy as np

from scrubvae_tpu.models import scrubbers as scr


class TestMALS:
    def test_update_is_ema_of_moments(self):
        st = scr.mals_init(4, 2)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)), jnp.float32)
        y = jnp.asarray(np.random.default_rng(1).normal(size=(16, 2)), jnp.float32)
        st2 = scr.mals_update(st, x, y)
        xx = np.asarray(x).T @ np.asarray(x)
        xy = np.asarray(x).T @ np.asarray(y)
        np.testing.assert_allclose(
            np.asarray(st2.Sxx0), 0.9 * np.eye(4) + xx, rtol=1e-4
        )
        np.testing.assert_allclose(np.asarray(st2.Sxy0), xy, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(st2.Sxx1), 1.0 * np.eye(4) + xx, rtol=1e-4
        )

    def test_forward_solves_normal_equations(self):
        rng = np.random.default_rng(2)
        W = rng.normal(size=(4, 2)).astype(np.float32)
        x = rng.normal(size=(200, 4)).astype(np.float32)
        y = x @ W
        st = scr.mals_init(4, 2)
        st = scr.mals_update(st, jnp.asarray(x), jnp.asarray(y))
        yhat0, yhat1 = scr.mals_forward(st, jnp.asarray(x))
        # Sxx includes the identity prior so the fit is ridge-regularized;
        # with 200 samples it should still be close.
        assert float(jnp.mean((yhat0 - jnp.asarray(y)) ** 2)) < 1e-2

    def test_lambda_walk_direction(self):
        st = scr.mals_init(4, 2)
        y = jnp.zeros((8, 2))
        good = jnp.zeros((8, 2))
        bad = jnp.ones((8, 2))
        _, st_down = scr.mals_loss(st, good, bad, y)  # decoder0 better
        assert float(st_down.lam0) < 0.9
        _, st_up = scr.mals_loss(st, bad, good, y)  # decoder1 better
        assert float(st_up.lam1) > 0.9 + st.lamdiff - 1e-6

    def test_polynomial_expansion(self):
        x = jnp.asarray([[1.0, 2.0, 3.0]])
        out = scr.polynomial_expand(x, 2)
        # degree-2 combos with replacement of 3 features: 6 terms,
        # scaled by n_features / n_combos = 3/6
        expected = np.asarray(
            [[1, 2, 3, 1 * 1 / 2, 1 * 2 / 2, 1 * 3 / 2, 4 / 2, 6 / 2, 9 / 2]]
        )
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


class TestMovingAverageFilter:
    def test_update_matches_manual_ema(self):
        classes = np.asarray([0, 1])
        st = scr.ma_init(3, classes)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(10, 3)), jnp.float32)
        y = jnp.asarray([0, 1] * 5)
        st2 = scr.ma_update(st, x, y)
        for i, c in enumerate(classes):
            xbar = np.asarray(x)[np.asarray(y) == c].mean(0)
            np.testing.assert_allclose(
                np.asarray(st2.m1[i]), (1 - 0.5) * xbar, rtol=1e-4, atol=1e-5
            )

    def test_loss_pulls_class_means_together(self):
        st = scr.ma_init(2, [0, 1])
        x = jnp.asarray([[1.0, 0.0]] * 4 + [[-1.0, 0.0]] * 4)
        y = jnp.asarray([0] * 4 + [1] * 4)
        loss, _ = scr.ma_loss(st, x, y)
        assert float(loss) > 0
        x_same = jnp.ones((8, 2))
        loss_same, _ = scr.ma_loss(st, x_same, y)
        assert float(loss_same) < float(loss)


class TestQDA:
    def test_cgll_matches_naive(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(6, 3)).astype(np.float32)
        m = rng.normal(size=(2, 3)).astype(np.float32)
        A = rng.normal(size=(2, 3, 3)).astype(np.float32)
        S = A @ np.swapaxes(A, -1, -2) + 3 * np.eye(3)
        ours = np.asarray(scr._cgll(jnp.asarray(x), jnp.asarray(m), jnp.asarray(S)))
        for c in range(2):
            for b in range(6):
                d = x[b] - m[c]
                expected = -0.5 * (
                    np.linalg.slogdet(S[c])[1] + d @ np.linalg.solve(S[c], d)
                )
                assert abs(ours[c, b] - expected) < 1e-3

    def test_update_masked_moments(self):
        st = scr.qda_init(3, [0, 1])
        rng = np.random.default_rng(5)
        x = rng.normal(size=(20, 3)).astype(np.float32)
        y = (np.arange(20) % 2).astype(np.int32)
        st2 = scr.qda_update(st, jnp.asarray(x), jnp.asarray(y))
        # class index 0: label 0; i1 mask selects y==0
        x1 = x[y == 0]
        m1_expected = 0.2 * x1.mean(0)  # (1-lama)*0 + lama*mean
        np.testing.assert_allclose(
            np.asarray(st2.m1a[0]), m1_expected, rtol=1e-4, atol=1e-5
        )
        cov = ((x1 - x1.mean(0)).T @ (x1 - x1.mean(0))) / len(x1)
        S_expected = 0.8 * np.eye(3) + 0.2 * cov
        np.testing.assert_allclose(
            np.asarray(st2.S1a[0]), S_expected, rtol=1e-3, atol=1e-4
        )

    def test_loss_separable_vs_mixed(self):
        st = scr.qda_init(2, [0, 1])
        # train the filter on separable data
        rng = np.random.default_rng(6)
        x0 = rng.normal(size=(50, 2)).astype(np.float32) + 4
        x1 = rng.normal(size=(50, 2)).astype(np.float32) - 4
        x = jnp.asarray(np.concatenate([x0, x1]))
        y = jnp.asarray([0] * 50 + [1] * 50)
        for _ in range(5):
            st = scr.qda_update(st, x, y)
        loss_sep, _ = scr.qda_loss(st, x, y, update=False)
        # shuffled labels: lower (less positive) log-likelihood-ratio
        y_shuf = jnp.asarray(np.random.default_rng(7).permutation(np.asarray(y)))
        loss_mix, _ = scr.qda_loss(st, x, y_shuf, update=False)
        assert float(loss_sep) > float(loss_mix)


class TestGradReversal:
    def test_gradient_is_negated_and_scaled(self):
        f = lambda x: jnp.sum(scr.grad_reverse(x, 2.0) ** 1)
        g = jax.grad(f)(jnp.ones(4))
        np.testing.assert_allclose(np.asarray(g), -2.0 * np.ones(4), rtol=1e-6)

    def test_ensemble_heads_shapes(self):
        m = scr.MLPEnsemble(3)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((5, 8)))
        outs = m.apply(params, jnp.zeros((5, 8)))
        assert len(outs) == 4
        assert all(o.shape == (5, 3) for o in outs)


class TestAdvNet:
    def test_fit_reduces_discriminator_loss(self):
        rng = jax.random.PRNGKey(0)
        state, model, tx = scr.adv_init(rng, 4 + 2)
        key = jax.random.PRNGKey(1)
        z = jax.random.normal(key, (32, 4))
        # v strongly dependent on z -> discriminator can learn
        v = jnp.concatenate([z[:, :1] * 2.0, z[:, 1:2] * -1.0], axis=-1)
        v_ind = jnp.asarray([0, 1])
        y = scr._adv_labels(32)

        def d_loss(params, rng):
            z_aug, v_aug = scr.adv_shuffle(rng, z, v, v_ind)
            preds = model.apply(params, z_aug, v_aug)
            return sum(scr._softmax_ce(p, y) for p in preds) / len(preds) / 32

        before = float(d_loss(state.params, jax.random.PRNGKey(2)))
        state2 = scr.adv_fit(model, tx, state, jax.random.PRNGKey(3), z, v, v_ind, n_iter=30)
        after = float(d_loss(state2.params, jax.random.PRNGKey(2)))
        assert after < before

    def test_generator_loss_is_negative_ce(self):
        rng = jax.random.PRNGKey(0)
        state, model, tx = scr.adv_init(rng, 6)
        z = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
        v = jax.random.normal(jax.random.PRNGKey(2), (16, 2))
        val = float(
            scr.adv_generator_loss(
                model, state, jax.random.PRNGKey(3), z, v, jnp.asarray([0, 1])
            )
        )
        assert val < 0  # -CE is negative


class TestMIEstimator:
    def test_matches_naive_numpy(self):
        rng = np.random.default_rng(8)
        x_s = rng.normal(size=(20, 3)).astype(np.float32)
        y_s = rng.normal(size=(20, 2)).astype(np.float32)
        x = rng.normal(size=(7, 3)).astype(np.float32)
        y = rng.normal(size=(7, 2)).astype(np.float32)
        bw = 0.7
        st = scr.mi_init(jnp.asarray(x_s), jnp.asarray(y_s), bw)
        ours = float(scr.mi_score(st, jnp.asarray(x), jnp.asarray(y)))

        from scipy.special import logsumexp

        log2pi = np.log(2 * np.pi)
        logA_x = 3 * (log2pi + np.log(bw))
        logA_y = 2 * (log2pi + np.log(bw))
        dx = x[:, None] - x_s[None]
        dy = y[:, None] - y_s[None]
        sdx = ((dx / bw) * dx).sum(-1)
        sdy = ((dy / bw) * dy).sum(-1)
        e_xy = logsumexp(-0.5 * (logA_x + logA_y + sdx + sdy), axis=-1)
        e_x = logsumexp(-0.5 * (logA_x + sdx), axis=-1)
        e_y = logsumexp(-0.5 * (logA_y + sdy), axis=-1)
        expected = float((e_xy - e_x - e_y).mean())
        assert abs(ours - expected) < 1e-3

    def test_diagonal_var_mode(self):
        rng = np.random.default_rng(9)
        x_s = rng.normal(size=(10, 3)).astype(np.float32)
        y_s = rng.normal(size=(10, 2)).astype(np.float32)
        L = np.tile(np.diag([0.5, 1.0, 2.0])[None], (10, 1, 1)).astype(np.float32)
        st = scr.mi_init(
            jnp.asarray(x_s), jnp.asarray(y_s), 0.5, var_mode="diagonal",
            model_L=jnp.asarray(L),
        )
        assert st.var_s.shape == (10, 3)
        np.testing.assert_allclose(
            np.asarray(st.var_s[0]), np.asarray([0.75, 1.5, 4.5]), rtol=1e-5
        )
        val = float(scr.mi_score(st, jnp.asarray(x_s[:4]), jnp.asarray(y_s[:4])))
        assert np.isfinite(val)


class TestRLS:
    def test_converges_to_linear_map(self):
        rng = np.random.default_rng(10)
        W = rng.normal(size=(3, 2)).astype(np.float32)
        st = scr.rls_init(3, 2)
        for i in range(30):
            x = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
            y = x @ jnp.asarray(W)
            st = scr.rls_update(st, x, y)
        x_test = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        pred = scr.rls_forward(st, x_test)
        np.testing.assert_allclose(
            np.asarray(pred), np.asarray(x_test @ jnp.asarray(W)), atol=0.05
        )


class TestLinearProjection:
    def test_null_space_projection(self):
        m = scr.LinearProjection(2)
        z = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
        params = m.init(jax.random.PRNGKey(1), z)
        out = m.apply(params, z)
        W = params["params"]["kernel"]
        # v of z_null should be ~0: z_null lies in the decoder's null space
        v_null = out["z_null"] @ W.T
        np.testing.assert_allclose(np.asarray(v_null), 0, atol=1e-4)
        # and projection is idempotent on the v component
        np.testing.assert_allclose(
            np.asarray(out["v"]), np.asarray(z @ W.T), atol=1e-5
        )


class TestMALossDegenerateGradient:
    def test_grad_finite_at_coincident_means(self):
        """norm of the pairwise class-mean differences is exactly zero when
        the means coincide (single class, or zero-initialized means on the
        first step); the gradient must stay finite."""
        from scrubvae_tpu.models import scrubbers as scr

        st = scr.ma_init(4, np.asarray([0]))  # single class -> empty triu
        x = jnp.ones((8, 4))
        y = jnp.zeros((8, 1))

        def f(xin):
            loss, _ = scr.ma_loss(st, xin, y)
            return loss

        g = jax.grad(f)(x)
        assert np.isfinite(np.asarray(g)).all()

        st2 = scr.ma_init(4, np.asarray([0, 1]))  # two classes, same mean
        y2 = jnp.concatenate([jnp.zeros((4, 1)), jnp.ones((4, 1))])
        def f2(xin):
            loss, _ = scr.ma_loss(st2, xin, y2)
            return loss
        g2 = jax.grad(f2)(x)
        assert np.isfinite(np.asarray(g2)).all()
