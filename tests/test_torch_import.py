"""Differential test for the torch .pth -> flax weight importer.

Instantiates the reference ResVAE (torch, CPU) at a tiny operating point,
imports its randomly-initialized state_dict into our flax ResVAE via
utils.torch_import, and checks the two models produce the same encode mu/L
and the same decoded x6d/root on the same inputs in eval mode - value-level
parity of every conv/dense/batchnorm/prelu layer and of the flatten-order
permutation (reference residual.py:183-491).
"""

import pathlib
import sys
import types
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = pathlib.Path("/root/reference/src")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")

from scrubvae_tpu.models.residual import ResVAE  # noqa: E402
from scrubvae_tpu.utils import torch_import as ti  # noqa: E402

ARENA = np.asarray([[-290.0, -290.0, 0.0], [290.0, 290.0, 120.0]], np.float32)


@pytest.fixture(scope="module")
def ref_res():
    for pkg, path in (
        ("scrubvae", REF / "scrubvae"),
        ("scrubvae.model", REF / "scrubvae" / "model"),
    ):
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [str(path)]
            sys.modules[pkg] = mod
    return importlib.import_module("scrubvae.model.residual")


@pytest.fixture(scope="module")
def dis_mod(ref_res):
    return importlib.import_module("scrubvae.model.disentangle")


def build_pair(ref_res, conditional_keys=(), discrete=None, diag=True, seed=0):
    """Architecture-matched (reference torch, our flax) model pair plus the
    imported variables tree."""
    torch.manual_seed(seed)
    n_joints, window, z_dim = 3, 31, 4
    ch = [8, 8, 16]
    in_ch = n_joints * 6 + 3
    discrete = discrete or {}
    cond_dim = sum(
        len(discrete[k]) if k in discrete else 1 for k in conditional_keys
    )
    ref = ref_res.ResVAE(
        in_channels=in_ch,
        ch=ch,
        kernel=5,
        z_dim=z_dim,
        window=window,
        is_diag=diag,
        conditional_dim=cond_dim,
        arena_size=torch.from_numpy(ARENA),
        disentangle=None,
        disentangle_keys=list(conditional_keys),
        conditional_keys=list(conditional_keys),
        discrete_classes={k: torch.from_numpy(v) for k, v in discrete.items()},
    )
    ref.eval()

    ours = ResVAE(
        in_channels=in_ch,
        ch=tuple(ch),
        kernel=5,
        z_dim=z_dim,
        window=window,
        is_diag=diag,
        conditional_dim=cond_dim,
        arena_size=tuple(map(tuple, ARENA)),
        conditional_keys=tuple(conditional_keys),
        discrete_classes={k: len(v) for k, v in discrete.items()},
    )
    data0 = {
        "x6d": jnp.zeros((2, window, n_joints, 6)),
        "root": jnp.zeros((2, window, 3)),
    }
    for k in conditional_keys:
        data0[k] = (
            jnp.zeros((2, 1))
            if k not in discrete
            else jnp.zeros((2, 1), jnp.int32)
        )
    variables = ours.init({"params": jax.random.PRNGKey(0)}, data0, train=False)

    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    new_vars, unmapped, unfilled = ti.convert_resvae_state_dict(sd, variables)
    # arena_size is a buffer on the reference module, static config here
    assert [k for k in unmapped if k != "arena_size"] == []
    assert unfilled == []
    return ref, ours, new_vars


def rand_data(rng, n=4, window=31, n_joints=3):
    x6d = rng.normal(size=(n, window, n_joints, 6)).astype(np.float32)
    x6d = np.tanh(x6d)
    root = rng.uniform(-200, 200, size=(n, window, 3)).astype(np.float32)
    root[..., 2] = np.abs(root[..., 2]) / 2.0
    return {"x6d": x6d, "root": root}


def to_torch(data):
    return {k: torch.from_numpy(np.asarray(v)) for k, v in data.items()}


def assert_close(ours, theirs, rtol=2e-4, atol=2e-5, msg=""):
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), rtol=rtol, atol=atol, err_msg=msg
    )


class TestTorchImport:
    def test_encode_decode_parity(self, ref_res):
        ref, ours, variables = build_pair(ref_res)
        data = rand_data(np.random.default_rng(0))

        with torch.no_grad():
            enc_r = ref.encode(to_torch(data))
        enc = ours.apply(
            variables, {k: jnp.asarray(v) for k, v in data.items()},
            train=False, method=ResVAE.encode,
        )
        assert_close(enc["mu"], enc_r["mu"], msg="mu")
        assert_close(enc["L"], enc_r["L"], msg="L")

        with torch.no_grad():
            out_r = ref(to_torch(data))
        out = ours.apply(
            variables, {k: jnp.asarray(v) for k, v in data.items()}, train=False
        )
        assert_close(out["x6d"], out_r["x6d"], rtol=5e-4, atol=5e-5, msg="x6d")
        # root decodes through inv_normalize_root (scale ~290)
        assert_close(out["root"], out_r["root"], rtol=5e-4, atol=5e-3, msg="root")

    def test_conditional_decode_parity(self, ref_res):
        discrete = {"ids": np.arange(2)}
        ref, ours, variables = build_pair(
            ref_res,
            conditional_keys=("avg_speed_3d", "ids"),
            discrete=discrete,
            seed=1,
        )
        rng = np.random.default_rng(1)
        data = rand_data(rng)
        data["avg_speed_3d"] = rng.normal(size=(4, 1)).astype(np.float32)
        data["ids"] = rng.integers(0, 2, size=(4, 1)).astype(np.float32)

        with torch.no_grad():
            out_r = ref(to_torch(data))
        jd = {k: jnp.asarray(v) for k, v in data.items()}
        jd["ids"] = jd["ids"].astype(jnp.int32)
        out = ours.apply(variables, jd, train=False)
        assert_close(out["var"], out_r["var"], msg="var")
        assert_close(out["x6d"], out_r["x6d"], rtol=5e-4, atol=5e-5, msg="x6d")

    def test_full_cholesky_head(self, ref_res):
        ref, ours, variables = build_pair(ref_res, diag=False, seed=2)
        data = rand_data(np.random.default_rng(2))
        with torch.no_grad():
            enc_r = ref.encode(to_torch(data))
        enc = ours.apply(
            variables, {k: jnp.asarray(v) for k, v in data.items()},
            train=False, method=ResVAE.encode,
        )
        assert_close(enc["L"], enc_r["L"], msg="full L")

    def test_scoped_tree_with_scrubber_heads(self, ref_res, dis_mod):
        """The factory wraps the VAE under a ScrubVAE 'vae' scope and adds
        linear/GR scrubber heads; the importer must detect the scope and map
        the reference's disentangle.* entries onto the head params
        (reference residual.py:338-361 forward composition)."""
        from scrubvae_tpu.models.scrubvae import ScrubVAE

        torch.manual_seed(5)
        n_joints, window, z_dim = 3, 31, 4
        in_ch = n_joints * 6 + 3
        ref = ref_res.ResVAE(
            in_channels=in_ch,
            ch=[8, 8, 16],
            kernel=5,
            z_dim=z_dim,
            window=window,
            is_diag=True,
            conditional_dim=0,
            arena_size=torch.from_numpy(ARENA),
            disentangle={
                "linear": {"avg_speed_3d": dis_mod.LinearProjection(z_dim, 3)},
                "grad_reversal": {"avg_speed_3d": dis_mod.GRScrubber(z_dim, 3)},
            },
            disentangle_keys=["avg_speed_3d"],
            conditional_keys=[],
            discrete_classes={},
        )
        ref.eval()

        ours = ScrubVAE(
            vae=ResVAE(
                in_channels=in_ch,
                ch=(8, 8, 16),
                kernel=5,
                z_dim=z_dim,
                window=window,
                is_diag=True,
                arena_size=tuple(map(tuple, ARENA)),
            ),
            linear_dims={"avg_speed_3d": 3},
            gr_dims={"avg_speed_3d": 3},
        )
        data0 = {"x6d": jnp.zeros((1, 31, 3, 6)), "root": jnp.zeros((1, 31, 3))}
        variables = ours.init({"params": jax.random.PRNGKey(3)}, data0, train=False)
        sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
        new_vars, unmapped, unfilled = ti.convert_resvae_state_dict(sd, variables)
        assert [k for k in unmapped if k != "arena_size"] == []
        assert unfilled == []

        data = rand_data(np.random.default_rng(5))
        with torch.no_grad():
            out_r = ref(to_torch(data))
        out = ours.apply(
            new_vars, {k: jnp.asarray(v) for k, v in data.items()}, train=False
        )
        assert_close(out["mu"], out_r["mu"], msg="scoped mu")
        lin_r = out_r["disentangle"]["linear"]["avg_speed_3d"]
        lin = out["disentangle"]["linear"]["avg_speed_3d"]
        assert_close(lin["v"], lin_r["v"], msg="linear v")
        assert_close(lin["z_null"], lin_r["z_null"], rtol=5e-4, atol=5e-5, msg="z_null")
        for i, (g, g_r) in enumerate(
            zip(
                out["disentangle"]["grad_reversal"]["avg_speed_3d"],
                out_r["disentangle"]["grad_reversal"]["avg_speed_3d"],
            )
        ):
            assert_close(g, g_r, rtol=5e-4, atol=5e-5, msg=f"gr head {i}")

    def test_checkpoint_pth_fallback(self, ref_res, tmp_path):
        """utils.checkpoint.load_weights falls back to the reference's
        weights/epoch_E.pth layout when no msgpack exists, so a config's
        model.load_model can point at a reference-trained run directly
        (reference get/model.py:141-149 strict=False load)."""
        from scrubvae_tpu.utils import checkpoint as ckpt

        ref, ours, imported = build_pair(ref_res, seed=4)
        (tmp_path / "weights").mkdir()
        torch.save(
            {k: v.cpu() for k, v in ref.state_dict().items()},
            tmp_path / "weights" / "epoch_10.pth",
        )
        data0 = {"x6d": jnp.zeros((1, 31, 3, 6)), "root": jnp.zeros((1, 31, 3))}
        init = ours.init({"params": jax.random.PRNGKey(2)}, data0, train=False)
        params, batch_stats = ckpt.load_weights(
            str(tmp_path), 10, init["params"], init["batch_stats"]
        )
        for a, b in zip(
            jax.tree.leaves(params), jax.tree.leaves(imported["params"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_file_roundtrip(self, ref_res, tmp_path):
        ref, ours, _ = build_pair(ref_res, seed=3)
        p = tmp_path / "epoch_5.pth"
        torch.save({k: v.cpu() for k, v in ref.state_dict().items()}, p)
        data0 = {
            "x6d": jnp.zeros((1, 31, 3, 6)),
            "root": jnp.zeros((1, 31, 3)),
        }
        variables = ours.init({"params": jax.random.PRNGKey(1)}, data0, train=False)
        new_vars = ti.import_torch_weights(p, variables, verbose=False)
        data = rand_data(np.random.default_rng(3))
        with torch.no_grad():
            enc_r = ref.encode(to_torch(data))
        enc = ours.apply(
            new_vars, {k: jnp.asarray(v) for k, v in data.items()},
            train=False, method=ResVAE.encode,
        )
        assert_close(enc["mu"], enc_r["mu"], msg="mu after file roundtrip")


@pytest.fixture(scope="module")
def ref_tf(ref_res):
    return importlib.import_module("scrubvae.model.transformer")


class TestTransformerImport:
    """Differential parity for the transformer family (reference
    model/transformer.py:29-167): reference torch TransformerVAE weights
    imported via convert_transformer_state_dict must reproduce the reference
    encoder's (mu, L) and the reference decoder's output in eval mode.
    window=50 because the reference hardcodes the head input as z_dim*50
    (transformer.py:63-66)."""

    Z, W, C, HEADS, FF, LAYERS = 16, 50, 21, 4, 32, 2

    def _pair(self, ref_tf, seed=0):
        from scrubvae_tpu.models.transformer import (
            TransformerDecoder,
            TransformerEncoder,
        )

        torch.manual_seed(seed)
        ref = ref_tf.TransformerVAE(
            in_channels=self.C, z_dim=self.Z, window=self.W,
            n_heads=self.HEADS, ff_size=self.FF, n_layers=self.LAYERS,
            is_diag=False,
        )
        ref.eval()
        enc = TransformerEncoder(
            z_dim=self.Z, window=self.W, n_heads=self.HEADS,
            ff_size=self.FF, n_layers=self.LAYERS, is_diag=False,
        )
        dec = TransformerDecoder(
            out_channels=self.C, z_dim=self.Z, window=self.W,
            n_heads=self.HEADS, ff_size=self.FF, n_layers=self.LAYERS,
        )
        x0 = jnp.zeros((2, self.W, self.C))
        enc_vars = enc.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
        dec_vars = dec.init(
            {"params": jax.random.PRNGKey(1)}, jnp.zeros((2, self.Z)), train=False
        )
        sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
        # n_heads deliberately omitted: inferred from the attention kernels
        enc_new, _, enc_unfilled = ti.convert_transformer_state_dict(sd, enc_vars)
        dec_new, unmapped, dec_unfilled = ti.convert_transformer_state_dict(
            sd, dec_vars, n_heads=self.HEADS
        )
        assert enc_unfilled == [], enc_unfilled
        assert dec_unfilled == [], dec_unfilled
        # every reference key lands in one of the two trees (pe buffers are
        # recomputed constants here)
        leftover = [k for k in unmapped if ".pe" not in k and "encoder." not in k]
        assert leftover == [], leftover
        return ref, enc, dec, enc_new, dec_new

    def test_encoder_parity(self, ref_tf):
        ref, enc, _, enc_vars, _ = self._pair(ref_tf)
        rng = np.random.default_rng(0)
        x = np.tanh(rng.normal(size=(3, self.W, self.C))).astype(np.float32)
        with torch.no_grad():
            mu_t, L_t = ref.encoder(torch.from_numpy(x.transpose(0, 2, 1)))
        mu, L = enc.apply(enc_vars, jnp.asarray(x), train=False)
        assert_close(mu, mu_t, rtol=5e-4, atol=5e-5, msg="transformer mu")
        assert_close(L, L_t, rtol=5e-4, atol=5e-5, msg="transformer L")

    def test_decoder_parity(self, ref_tf):
        ref, _, dec, _, dec_vars = self._pair(ref_tf, seed=1)
        rng = np.random.default_rng(1)
        z = rng.normal(size=(3, self.Z)).astype(np.float32)
        with torch.no_grad():
            out_t = ref.decoder(torch.from_numpy(z))  # (B, C, W)
        out = dec.apply(dec_vars, jnp.asarray(z), train=False)  # (B, W, C)
        assert_close(
            out.transpose(0, 2, 1), out_t, rtol=5e-4, atol=5e-5,
            msg="transformer decoder",
        )
