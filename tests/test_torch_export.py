"""Differential test for the flax -> torch .pth weight exporter.

Mirror of test_torch_import: initializes OUR flax models randomly, exports
the variables to a reference-layout state_dict via utils.torch_export, loads
it into the reference torch model (strict=False, as the reference's own
loader does, get/model.py:141-149), and checks both produce the same
outputs — proving a run trained here can be handed back to the reference
codebase's eval/plot tooling.
"""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = pathlib.Path("/root/reference/src")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from test_torch_import import (  # noqa: E402
    ARENA,
    assert_close,
    build_pair,
    rand_data,
    ref_res,  # noqa: F401  (fixture re-export)
    dis_mod,  # noqa: F401
    ref_tf,  # noqa: F401
    to_torch,
)

from scrubvae_tpu.models.residual import ResVAE  # noqa: E402
from scrubvae_tpu.utils import torch_export as te  # noqa: E402
from scrubvae_tpu.utils import torch_import as ti  # noqa: E402


def load_into_ref(ref, sd):
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False,
    )
    # arena_size is a module buffer (static config here); nothing else may
    # be missing, and every exported key must land
    assert [k for k in missing if "arena_size" not in k] == [], missing
    assert unexpected == [], unexpected


class TestResVAEExport:
    def test_forward_parity_random_flax_init(self, ref_res):
        """Random FLAX weights exported into the reference model: encode and
        full forward agree (the export direction, not just a roundtrip of
        torch-initialized weights)."""
        ref, ours, _ = build_pair(ref_res, seed=10)
        data0 = {"x6d": jnp.zeros((1, 31, 3, 6)), "root": jnp.zeros((1, 31, 3))}
        variables = ours.init({"params": jax.random.PRNGKey(7)}, data0, train=False)

        sd, unexported = te.export_resvae_state_dict(variables)
        assert unexported == [], unexported
        load_into_ref(ref, sd)

        data = rand_data(np.random.default_rng(10))
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
        assert_close(out["root"], out_r["root"], rtol=5e-4, atol=5e-3, msg="root")

    def test_roundtrip_identity(self, ref_res):
        """export -> import reproduces every leaf exactly (the two layout
        maps are true inverses)."""
        _, ours, _ = build_pair(ref_res, diag=False, seed=11)
        data0 = {"x6d": jnp.zeros((1, 31, 3, 6)), "root": jnp.zeros((1, 31, 3))}
        variables = ours.init({"params": jax.random.PRNGKey(8)}, data0, train=False)

        sd, _ = te.export_resvae_state_dict(variables)
        back, unmapped, unfilled = ti.convert_resvae_state_dict(
            {k: np.asarray(v) for k, v in sd.items()}, variables
        )
        # num_batches_tracked is emitted for torch compatibility only
        assert [k for k in unmapped if "num_batches_tracked" not in k] == []
        assert unfilled == []
        import flax

        fa = flax.traverse_util.flatten_dict(variables, sep="/")
        fb = flax.traverse_util.flatten_dict(back, sep="/")
        assert set(fa) == set(fb)
        for p in fa:
            np.testing.assert_array_equal(
                np.asarray(fa[p]), np.asarray(fb[p]), err_msg=p
            )

    def test_scrubber_heads_export(self, ref_res, dis_mod):
        """Scoped ScrubVAE tree: the linear/GR scrubber heads export onto the
        reference disentangle.* ModuleDict entries."""
        from scrubvae_tpu.models.scrubvae import ScrubVAE

        torch.manual_seed(12)
        n_joints, window, z_dim = 3, 31, 4
        in_ch = n_joints * 6 + 3
        ref = ref_res.ResVAE(
            in_channels=in_ch, ch=[8, 8, 16], kernel=5, z_dim=z_dim,
            window=window, is_diag=True, conditional_dim=0,
            arena_size=torch.from_numpy(ARENA),
            disentangle={
                "linear": {"avg_speed_3d": dis_mod.LinearProjection(z_dim, 3)},
                "grad_reversal": {"avg_speed_3d": dis_mod.GRScrubber(z_dim, 3)},
            },
            disentangle_keys=["avg_speed_3d"],
            conditional_keys=[], discrete_classes={},
        )
        ref.eval()
        ours = ScrubVAE(
            vae=ResVAE(
                in_channels=in_ch, ch=(8, 8, 16), kernel=5, z_dim=z_dim,
                window=window, is_diag=True,
                arena_size=tuple(map(tuple, ARENA)),
            ),
            linear_dims={"avg_speed_3d": 3},
            gr_dims={"avg_speed_3d": 3},
        )
        data0 = {"x6d": jnp.zeros((1, 31, 3, 6)), "root": jnp.zeros((1, 31, 3))}
        variables = ours.init({"params": jax.random.PRNGKey(9)}, data0, train=False)

        sd, unexported = te.export_resvae_state_dict(variables)
        assert unexported == [], unexported
        load_into_ref(ref, sd)

        data = rand_data(np.random.default_rng(12))
        with torch.no_grad():
            out_r = ref(to_torch(data))
        out = ours.apply(
            variables, {k: jnp.asarray(v) for k, v in data.items()}, train=False
        )
        assert_close(out["mu"], out_r["mu"], msg="mu")
        lin = out["disentangle"]["linear"]["avg_speed_3d"]
        lin_r = out_r["disentangle"]["linear"]["avg_speed_3d"]
        assert_close(lin["v"], lin_r["v"], msg="linear v")
        for i, (g, g_r) in enumerate(
            zip(
                out["disentangle"]["grad_reversal"]["avg_speed_3d"],
                out_r["disentangle"]["grad_reversal"]["avg_speed_3d"],
            )
        ):
            assert_close(g, g_r, rtol=5e-4, atol=5e-5, msg=f"gr head {i}")

    def test_low_rank_head_exports_equivalent_dense(self, ref_res):
        """The factored fc_sigma (config-gated deviation) exports as the
        composed dense map; the reference model then reproduces our L."""
        ref, _, _ = build_pair(ref_res, diag=False, seed=13)
        ours = ResVAE(
            in_channels=3 * 6 + 3, ch=(8, 8, 16), kernel=5, z_dim=4,
            window=31, is_diag=False, arena_size=tuple(map(tuple, ARENA)),
            sigma_head_rank=3,
        )
        data0 = {"x6d": jnp.zeros((1, 31, 3, 6)), "root": jnp.zeros((1, 31, 3))}
        variables = ours.init({"params": jax.random.PRNGKey(10)}, data0, train=False)

        sd, unexported = te.export_resvae_state_dict(variables)
        assert unexported == [], unexported
        load_into_ref(ref, sd)

        data = rand_data(np.random.default_rng(13))
        with torch.no_grad():
            enc_r = ref.encode(to_torch(data))
        enc = ours.apply(
            variables, {k: jnp.asarray(v) for k, v in data.items()},
            train=False, method=ResVAE.encode,
        )
        assert_close(enc["L"], enc_r["L"], rtol=5e-4, atol=5e-5, msg="low-rank L")

    def test_file_dispatch(self, ref_res, tmp_path):
        """export_torch_weights writes a .pth the importer round-reads."""
        _, ours, _ = build_pair(ref_res, seed=14)
        data0 = {"x6d": jnp.zeros((1, 31, 3, 6)), "root": jnp.zeros((1, 31, 3))}
        variables = ours.init({"params": jax.random.PRNGKey(11)}, data0, train=False)
        p = tmp_path / "epoch_5.pth"
        te.export_torch_weights(variables, p, verbose=False)
        back = ti.import_torch_weights(p, variables, verbose=False)
        for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTransformerExport:
    Z, W, C, HEADS, FF, LAYERS = 16, 50, 21, 4, 32, 2

    def test_encoder_decoder_parity(self, ref_tf):
        from scrubvae_tpu.models.transformer import (
            TransformerDecoder,
            TransformerEncoder,
        )

        torch.manual_seed(20)
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
        enc_vars = enc.init({"params": jax.random.PRNGKey(20)}, x0, train=False)
        dec_vars = dec.init(
            {"params": jax.random.PRNGKey(21)}, jnp.zeros((2, self.Z)), train=False
        )

        sd_e, un_e = te.export_transformer_state_dict(enc_vars)
        sd_d, un_d = te.export_transformer_state_dict(dec_vars)
        assert un_e == [], un_e
        assert un_d == [], un_d
        missing, unexpected = ref.load_state_dict(
            {
                k: torch.from_numpy(np.asarray(v))
                for k, v in {**sd_e, **sd_d}.items()
            },
            strict=False,
        )
        # pe buffers are recomputed constants in both frameworks
        assert [k for k in missing if ".pe" not in k] == [], missing
        assert unexpected == [], unexpected

        rng = np.random.default_rng(20)
        x = np.tanh(rng.normal(size=(3, self.W, self.C))).astype(np.float32)
        with torch.no_grad():
            mu_t, L_t = ref.encoder(torch.from_numpy(x.transpose(0, 2, 1)))
        mu, L = enc.apply(enc_vars, jnp.asarray(x), train=False)
        assert_close(mu, mu_t, rtol=5e-4, atol=5e-5, msg="exported mu")
        assert_close(L, L_t, rtol=5e-4, atol=5e-5, msg="exported L")

        z = rng.normal(size=(3, self.Z)).astype(np.float32)
        with torch.no_grad():
            out_t = ref.decoder(torch.from_numpy(z))
        out = dec.apply(dec_vars, jnp.asarray(z), train=False)
        assert_close(
            out.transpose(0, 2, 1), out_t, rtol=5e-4, atol=5e-5,
            msg="exported decoder",
        )
