"""Model-layer tests: conv arithmetic parity, Cholesky head, VAE shapes,
conditional decode, transformer variant."""

import jax
import jax.numpy as jnp
import numpy as np

from scrubvae_tpu.models.layers import (
    CholeskyL,
    Conv1d,
    ConvTranspose1d,
    conv_out_len,
    conv_transpose_out_len,
    decoder_lengths,
    encoder_lengths,
    upsample_linear_1d,
)
from scrubvae_tpu.models.mlp_vae import MLPVAE
from scrubvae_tpu.models.residual import ResVAE
from scrubvae_tpu.models.scrubvae import ScrubVAE
from scrubvae_tpu.models.transformer import TransformerVAE

ARENA = ((-300.0, -300.0, 0.0), (300.0, 300.0, 100.0))


def dummy_batch(B=2, W=51, J=18, with_conditional=False):
    rng = np.random.default_rng(0)
    data = {
        "x6d": jnp.asarray(rng.normal(size=(B, W, J, 6)).astype(np.float32)),
        "root": jnp.asarray(rng.normal(size=(B, W, 3)).astype(np.float32)),
    }
    if with_conditional:
        data["avg_speed_3d"] = jnp.asarray(
            rng.normal(size=(B, 3)).astype(np.float32)
        )
        data["ids"] = jnp.asarray(rng.integers(0, 4, size=(B,)))
    return data


class TestConvArithmetic:
    def test_encoder_lengths_match_reference_math(self):
        # Reference find_latent_dim for window=51, kernel=5, 4 layers -> 4
        # (residual.py:6-20 float-chain truncates to the same value as exact
        # per-layer floor arithmetic for these defaults).
        assert encoder_lengths(51, 5, 4, [1, 1, 1, 1])[-1] == 4
        assert encoder_lengths(200, 5, 4, [1, 1, 1, 1])[-1] == 13

    def test_decoder_final_kernel_reconstructs_window(self):
        lat = encoder_lengths(51, 5, 4, [1] * 4)[-1]
        l_out = decoder_lengths(lat, 5, 4)[-1]
        final_kernel = 51 - l_out + 7
        # ConvTranspose(final_kernel, stride 1, pad 3) output length:
        assert conv_transpose_out_len(l_out, final_kernel, 1, 3) == 51

    def test_torch_conv_parity(self):
        torch = __import__("torch")
        x = np.random.default_rng(1).normal(size=(2, 51, 7)).astype(np.float32)
        for k, s, d in [(5, 2, 1), (3, 1, 1), (5, 1, 2), (7, 1, 1)]:
            p = k // 2
            ours_len = conv_out_len(51, k, s, p, d)
            t = torch.nn.Conv1d(7, 4, k, s, p, dilation=d)(
                torch.from_numpy(x.transpose(0, 2, 1))
            )
            assert t.shape[-1] == ours_len
            m = Conv1d(4, k, s, p, d)
            params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
            out = m.apply(params, jnp.asarray(x))
            assert out.shape == (2, ours_len, 4)

    def test_torch_conv_transpose_parity(self):
        torch = __import__("torch")
        x = np.random.default_rng(2).normal(size=(2, 13, 6)).astype(np.float32)
        for k, s, p in [(5, 2, 2), (5, 1, 2), (9, 1, 3), (6, 1, 2)]:
            t = torch.nn.ConvTranspose1d(6, 4, k, s, p)(
                torch.from_numpy(x.transpose(0, 2, 1))
            )
            ours_len = conv_transpose_out_len(13, k, s, p)
            assert t.shape[-1] == ours_len
            m = ConvTranspose1d(4, k, s, p)
            params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
            out = m.apply(params, jnp.asarray(x))
            assert out.shape == (2, ours_len, 4)

    def test_upsample_linear_matches_torch(self):
        torch = __import__("torch")
        x = np.random.default_rng(3).normal(size=(2, 8, 3)).astype(np.float32)
        ours = np.asarray(upsample_linear_1d(jnp.asarray(x), 2))
        theirs = (
            torch.nn.Upsample(scale_factor=2, mode="linear", align_corners=False)(
                torch.from_numpy(x.transpose(0, 2, 1))
            )
            .numpy()
            .transpose(0, 2, 1)
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestCholeskyL:
    def test_lower_triangular_positive_diag(self):
        D = 5
        m = CholeskyL(D, is_diag=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (3, D * (D + 1) // 2))
        L = m.apply(m.init(jax.random.PRNGKey(1), x), x)
        assert L.shape == (3, D, D)
        np.testing.assert_allclose(
            np.asarray(jnp.triu(L, k=1)), 0.0, atol=1e-7
        )
        assert (np.asarray(jnp.diagonal(L, axis1=-2, axis2=-1)) > 0).all()

    def test_diag_mode(self):
        D = 4
        m = CholeskyL(D, is_diag=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (3, D))
        L = m.apply(m.init(jax.random.PRNGKey(1), x), x)
        off = np.asarray(L) - np.asarray(
            jnp.zeros((3, D, D)).at[:, np.arange(D), np.arange(D)].set(
                jnp.diagonal(L, axis1=-2, axis2=-1)
            )
        )
        np.testing.assert_allclose(off, 0.0, atol=1e-7)


class TestPackedCholesky:
    """The packed tril representation (models/layers.py packed_*) must be a
    pure execution-strategy change: identical math to CholeskyL + einsum +
    prior_loss on the materialized factor, with interchangeable weights."""

    def test_packed_helpers_match_materialized(self):
        from scrubvae_tpu.models.layers import (
            packed_diag,
            packed_matvec,
            packed_softplus_diag,
            packed_sumsq,
            packed_to_L,
        )
        from scrubvae_tpu.ops.losses import prior_loss, prior_loss_packed

        D, B = 7, 4
        K = D * (D + 1) // 2
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
        mu = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

        m = CholeskyL(D, is_diag=False)
        L = m.apply(m.init(jax.random.PRNGKey(1), x), x)
        xp = packed_softplus_diag(x, D)

        np.testing.assert_allclose(
            np.asarray(packed_to_L(xp, D)), np.asarray(L), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(packed_diag(xp, D)),
            np.asarray(jnp.diagonal(L, axis1=-2, axis2=-1)),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(packed_sumsq(xp)), float(jnp.sum(L * L)), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(packed_matvec(xp, v, D)),
            np.asarray(jnp.einsum("bij,bj->bi", L, v)),
            rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            float(prior_loss_packed(mu, xp)),
            float(prior_loss(mu, L)),
            rtol=1e-6,
        )

    def test_packed_helpers_diag_mode(self):
        from scrubvae_tpu.models.layers import (
            packed_diag,
            packed_matvec,
            packed_softplus_diag,
        )

        D, B = 5, 3
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        m = CholeskyL(D, is_diag=True)
        L = m.apply(m.init(jax.random.PRNGKey(1), x), x)
        xp = packed_softplus_diag(x, D)
        np.testing.assert_allclose(
            np.asarray(packed_diag(xp, D)),
            np.asarray(jnp.diagonal(L, axis1=-2, axis2=-1)),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(packed_matvec(xp, v, D)),
            np.asarray(jnp.einsum("bij,bj->bi", L, v)),
            rtol=1e-6,
        )

    def test_resvae_packed_equals_full(self):
        """Same weights, same rng: packed and full ResVAE produce the same
        z/recon/prior loss and the same fc_sigma gradient."""
        from scrubvae_tpu.ops.losses import prior_loss, prior_loss_packed

        kw = dict(
            in_channels=18 * 6 + 3,
            ch=(8, 16, 16, 32, 32),
            kernel=5,
            z_dim=12,
            window=51,
            arena_size=ARENA,
        )
        full = ResVAE(packed_sigma=False, **kw)
        packed = ResVAE(packed_sigma=True, **kw)
        data = dummy_batch(B=2, W=51)
        rng = jax.random.PRNGKey(0)
        variables = full.init({"params": rng}, data, rng=rng)

        def run(model, key):
            def loss(vs):
                out = model.apply(
                    vs, data, rng=rng, train=True,
                    mutable=["batch_stats"],
                )[0]
                pl = (
                    prior_loss_packed(out["mu"], out["Lp"])
                    if key == "Lp"
                    else prior_loss(out["mu"], out["L"])
                )
                return pl + jnp.sum(out["x6d"] ** 2), out

            (val, out), grads = jax.value_and_grad(loss, has_aux=True)(
                variables
            )
            return val, out, grads

        v_f, out_f, g_f = run(full, "L")
        v_p, out_p, g_p = run(packed, "Lp")
        np.testing.assert_allclose(
            np.asarray(out_p["z"]), np.asarray(out_f["z"]), rtol=2e-5, atol=2e-6
        )
        np.testing.assert_allclose(float(v_p), float(v_f), rtol=1e-5)
        gk_f = g_f["params"]["encoder"]["fc_sigma"]["kernel"]
        gk_p = g_p["params"]["encoder"]["fc_sigma"]["kernel"]
        # f32 reassociation through the two different (equivalent) graphs;
        # z agrees at 2e-5, so residual grad diffs are rounding, not math
        np.testing.assert_allclose(
            np.asarray(gk_p), np.asarray(gk_f), rtol=2e-3, atol=5e-5
        )


class TestResVAE:
    def test_forward_shapes_and_finite(self):
        model = ResVAE(
            in_channels=18 * 6 + 3,
            ch=(8, 16, 16, 32, 32),
            kernel=5,
            z_dim=12,
            window=51,
            arena_size=ARENA,
        )
        data = dummy_batch()
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, data, rng=rng, train=True)
        out, _ = model.apply(
            variables, data, rng=rng, train=True, mutable=["batch_stats"]
        )
        assert out["mu"].shape == (2, 12)
        assert out["L"].shape == (2, 12, 12)
        assert out["x6d"].shape == (2, 51, 18, 6)
        assert out["root"].shape == (2, 51, 3)
        for v in jax.tree.leaves(out):
            assert bool(jnp.isfinite(v).all())

    def test_low_rank_sigma_head(self):
        """model.sigma_head_rank factorizes fc_sigma (params shrink ~rank/
        sig_dim) while L keeps full lower-tri structure and finite values."""
        kw = dict(
            in_channels=18 * 6 + 3, ch=(8, 16, 16, 32, 32), kernel=5,
            z_dim=12, window=51, arena_size=ARENA,
        )
        data = dummy_batch()
        rng = jax.random.PRNGKey(0)
        full = ResVAE(**kw)
        lowr = ResVAE(**kw, sigma_head_rank=8)
        vf = full.init({"params": rng}, data, rng=rng, train=True)
        vl = lowr.init({"params": rng}, data, rng=rng, train=True)

        def n_params(v):
            return sum(x.size for x in jax.tree.leaves(v["params"]))

        assert n_params(vl) < n_params(vf)
        assert "fc_sigma_u" in vl["params"]["encoder"]
        assert "fc_sigma" not in vl["params"]["encoder"]
        out, _ = lowr.apply(vl, data, rng=rng, train=True, mutable=["batch_stats"])
        L = out["L"]
        assert L.shape == (2, 12, 12)
        assert bool(jnp.isfinite(L).all())
        # strictly lower-tri above diag is zero; diag positive (CholeskyL)
        assert bool((jnp.triu(L, 1) == 0).all())
        assert bool((jnp.diagonal(L, axis1=-2, axis2=-1) > 0).all())

    def test_eval_uses_mu(self):
        model = ResVAE(
            in_channels=18 * 6 + 3,
            ch=(8, 16, 16, 32, 32),
            z_dim=8,
            window=51,
            arena_size=ARENA,
        )
        data = dummy_batch()
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, data, rng=rng, train=True)
        out = model.apply(variables, data, rng=rng, train=False)
        np.testing.assert_allclose(np.asarray(out["z"]), np.asarray(out["mu"]))

    def test_conditional_decode_dims(self):
        model = ResVAE(
            in_channels=18 * 6 + 3,
            ch=(8, 16, 16, 32, 32),
            z_dim=8,
            window=51,
            arena_size=ARENA,
            conditional_dim=3 + 4,
            conditional_keys=("avg_speed_3d", "ids"),
            discrete_classes={"ids": 4},
        )
        data = dummy_batch(with_conditional=True)
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, data, rng=rng, train=True)
        out, _ = model.apply(
            variables, data, rng=rng, train=True, mutable=["batch_stats"]
        )
        assert out["var"].shape == (2, 7)

    def test_beta_prior_heads(self):
        model = ResVAE(
            in_channels=18 * 6 + 3,
            ch=(8, 16, 16, 32, 32),
            z_dim=8,
            window=51,
            arena_size=ARENA,
            prior="beta",
        )
        data = dummy_batch()
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, data, rng=rng, train=True)
        out, _ = model.apply(
            variables, data, rng=rng, train=True, mutable=["batch_stats"]
        )
        assert (np.asarray(out["alpha"]) > 1).all()
        assert (np.asarray(out["beta"]) > 1).all()
        assert (np.abs(np.asarray(out["z"])) <= 1).all()


class TestScrubVAEAssembly:
    def test_linear_and_gr_passes(self):
        vae = MLPVAE(
            in_channels=18 * 6 + 3,
            window=51,
            z_dim=8,
            hidden=(32,),
            arena_size=ARENA,
        )
        model = ScrubVAE(
            vae=vae, linear_dims={"avg_speed_3d": 3}, gr_dims={"avg_speed_3d": 3}
        )
        data = dummy_batch()
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, data, rng=rng, train=True)
        out = model.apply(variables, data, rng=rng, train=True)
        dis = out["disentangle"]
        assert dis["linear"]["avg_speed_3d"]["v"].shape == (2, 3)
        assert dis["linear"]["avg_speed_3d"]["z_null"].shape == (2, 8)
        assert len(dis["grad_reversal"]["avg_speed_3d"]) == 4

    def test_gr_uses_null_space_latent(self):
        """GR heads must consume z_null when a linear projection exists
        (reference residual.py:352-356)."""
        vae = MLPVAE(
            in_channels=18 * 6 + 3, window=51, z_dim=8, hidden=(32,),
            arena_size=ARENA,
        )
        model = ScrubVAE(
            vae=vae, linear_dims={"heading": 2}, gr_dims={"heading": 2}
        )
        data = dummy_batch()
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, data, rng=rng, train=True)

        # Gradient of GR output wrt the linear decoder weight should be
        # nonzero only through z_null (sanity: it is connected).
        def f(params):
            out = model.apply({"params": params}, data, rng=rng, train=True)
            return jnp.sum(out["disentangle"]["grad_reversal"]["heading"][0])

        g = jax.grad(f)(variables["params"])
        gnorm = float(
            sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g["linear_heading"]))
        )
        assert gnorm > 0


class TestTransformerVAE:
    def test_shapes(self):
        model = TransformerVAE(
            in_channels=111,
            z_dim=16,
            window=16,
            n_heads=2,
            ff_size=32,
            n_layers=1,
            arena_size=ARENA,
        )
        data = dummy_batch(B=2, W=16)
        rng = jax.random.PRNGKey(1)
        variables = model.init({"params": rng, "dropout": rng}, data, rng=rng)
        out = model.apply(
            variables, data, rng=rng, train=True, rngs={"dropout": rng}
        )
        assert out["x6d"].shape == (2, 16, 18, 6)
        assert out["root"].shape == (2, 16, 3)
        assert out["mu"].shape == (2, 16)
        assert out["L"].shape == (2, 16, 16)
        assert np.isfinite(np.asarray(out["x6d"])).all()

    def test_conditional_decode_and_factory_dispatch(self):
        from scrubvae_tpu import factory

        model, info = factory.build_model(
            {
                "type": "transformer",
                "z_dim": 8,
                "window": 16,
                "n_heads": 2,
                "ff_size": 16,
                "n_layers": 1,
            },
            {"method": {"conditional": ["avg_speed_3d", "ids"]}},
            n_keypts=18,
            direction_process="midfwd",
            arena_size=np.asarray(ARENA, np.float32),
            discrete_classes={"ids": np.arange(4)},
        )
        data = dummy_batch(B=2, W=16, with_conditional=True)
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng}, data, rng=rng)
        out = model.apply(
            variables, data, rng=rng, train=True, rngs={"dropout": rng}
        )
        # conditional vector = 3 (speed) + 4 (one-hot ids)
        assert out["var"].shape == (2, 7)
        assert out["x6d"].shape == (2, 16, 18, 6)


class TestMixedPrecision:
    def test_bf16_forward_close_to_fp32(self):
        """bf16 compute path (precision='bf16') stays close to fp32 on the
        same params - validates the mixed-precision wiring, not accuracy."""
        kw = dict(
            in_channels=18 * 6 + 3,
            ch=(8, 16, 16, 32, 32),
            kernel=5,
            z_dim=8,
            window=51,
            arena_size=ARENA,
        )
        m32 = ResVAE(**kw)
        m16 = ResVAE(precision="bf16", **kw)
        data = dummy_batch()
        rng = jax.random.PRNGKey(0)
        variables = m32.init({"params": rng}, data, rng=rng, train=False)
        o32 = m32.apply(variables, data, rng=rng, train=False)
        o16 = m16.apply(variables, data, rng=rng, train=False)
        assert o16["x6d"].dtype == jnp.float32  # f32 at the loss boundary
        assert o16["mu"].dtype == jnp.float32
        # bf16 has ~3 decimal digits; the nets are shallow so error stays small
        err = float(jnp.max(jnp.abs(o16["x6d"] - o32["x6d"])))
        assert err < 0.1, err
        corr = np.corrcoef(
            np.asarray(o16["mu"]).ravel(), np.asarray(o32["mu"]).ravel()
        )[0, 1]
        assert corr > 0.99, corr


class TestServingExport:
    """jax.export serving artifacts: encoder/decoder serialize with a
    polymorphic batch dim, deserialize without model code, and reproduce
    the live apply outputs at multiple batch sizes."""

    def test_encoder_decoder_roundtrip(self):
        from scrubvae_tpu.utils.export import (
            export_decoder,
            export_encoder,
            load_exported,
        )

        model = ResVAE(
            in_channels=18 * 6 + 3, ch=(8, 8, 16, 16, 32), z_dim=6,
            window=31, arena_size=ARENA, conditional_dim=2,
            conditional_keys=("heading",),
        )
        data = dummy_batch(W=31)
        data["heading"] = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 2)).astype(np.float32))
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, data, rng=rng, train=False)

        enc_blob = export_encoder(model, variables, data)
        enc = load_exported(enc_blob)
        for B in (2, 5):
            d = {k: jnp.tile(data[k][:1], (B,) + (1,) * (data[k].ndim - 1))
                 for k in ("x6d", "root")}
            got = enc.call(d)
            ref = model.apply(variables, d, train=False, method=model.encode)
            np.testing.assert_allclose(
                np.asarray(got["mu"]), np.asarray(ref["mu"]), atol=1e-5
            )
            assert got["L"].shape == (B, 6, 6)

        dec_blob = export_decoder(
            model, variables, data, z_dim=6, conditional_keys=("heading",)
        )
        dec = load_exported(dec_blob)
        z = jnp.asarray(np.random.default_rng(1).normal(size=(3, 6)).astype(np.float32))
        cond = {"heading": jnp.tile(data["heading"][:1], (3, 1))}
        got = dec.call(z, cond)
        ref = model.apply(
            variables, z, dict(cond), train=False, method=model.decode
        )
        np.testing.assert_allclose(
            np.asarray(got["x6d"]), np.asarray(ref["x6d"]), atol=1e-5
        )

    def test_mu_only_encoder_dces_sigma_head(self):
        """The latent-extraction export (mu_only=True) must return the same
        mu (up to fusion-order rounding) AND actually drop the Cholesky head
        from the artifact (jax lowering DCE) - checked by blob size, since
        fc_sigma dominates the embedded constants."""
        from scrubvae_tpu.utils.export import export_encoder, load_exported

        model = ResVAE(
            in_channels=18 * 6 + 3, ch=(8, 8, 16, 16, 32), z_dim=32,
            window=31, arena_size=ARENA,
        )
        data = dummy_batch(W=31)
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, data, rng=rng, train=False)

        full_blob = export_encoder(model, variables, data)
        mu_blob = export_encoder(model, variables, data, mu_only=True)
        # Shape-robust DCE check (ADVICE r3): the artifact must shrink by
        # at least ~the fc_sigma constant's own byte size, computed from
        # the actual param tree rather than a hardcoded ratio tied to the
        # tiny test shapes.
        sigma_leaves = [
            np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(
                variables["params"]
            )[0]
            if any("fc_sigma" in str(p) for p in path)
        ]
        sigma_bytes = sum(v.size * v.dtype.itemsize for v in sigma_leaves)
        assert sigma_bytes > 0
        shrink = len(full_blob) - len(mu_blob)
        assert shrink >= 0.9 * sigma_bytes, (
            shrink, sigma_bytes, len(mu_blob), len(full_blob),
        )

        enc_mu = load_exported(mu_blob)
        d = {k: jnp.tile(data[k][:1], (3,) + (1,) * (data[k].ndim - 1))
             for k in ("x6d", "root")}
        got = enc_mu.call(d)
        assert set(got.keys()) == {"mu"}
        ref = model.apply(variables, d, train=False, method=model.encode)
        np.testing.assert_allclose(
            np.asarray(got["mu"]), np.asarray(ref["mu"]), atol=1e-6
        )
