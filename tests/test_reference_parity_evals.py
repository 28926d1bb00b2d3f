"""Differential parity tests for the eval layer against the reference.

Covers the two eval components whose round-1 verification was behavioral
only:

- decodability ``rand_cv`` family  (reference src/scrubvae/eval/metrics.py:231-305)
- generative restrictiveness       (reference src/scrubvae/eval/eval.py:22-120)
- aux metrics mmd/entropy/hungarian (reference src/scrubvae/eval/metrics.py:332-412)

The reference modules are loaded from the read-only checkout with stub
packages for heavy imports those code paths never touch (same approach as
tools/ref_baseline.py).  For generative restrictiveness the random factor
injection cannot be seed-matched across torch/JAX RNGs, so both sides run
with a canned decoder (identity ``decode`` returning the same tensors) and
the deterministic re-measurement half — forward kinematics, heading
extraction, part-speed extraction, normalization — is compared exactly.
"""

import importlib
import pathlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = pathlib.Path("/root/reference/src")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")

from scrubvae_tpu.data.skeleton import load_skeleton  # noqa: E402
from scrubvae_tpu.evals import metrics as our_metrics  # noqa: E402
from scrubvae_tpu.evals.restrictiveness import (  # noqa: E402
    generative_restrictiveness_batch,
)

SKEL = load_skeleton("configs/mouse_skeleton.yaml")


@pytest.fixture(scope="module")
def ref():
    """Reference eval modules, loaded without the package __init__ chain."""
    from _ref_stubs import install_ref_stubs

    install_ref_stubs()
    # eval.eval imports `from scrubvae.plot import trace, PLANE`
    constants = importlib.import_module("scrubvae.plot.constants")
    plot_pkg = sys.modules["scrubvae.plot"]
    plot_pkg.trace = lambda *a, **k: None
    plot_pkg.PLANE = constants.PLANE

    eval_eval = importlib.import_module("scrubvae.eval.eval")
    eval_pkg = sys.modules["scrubvae.eval"]
    # metrics.py imports `from . import project_to_null` and `from ..eval
    # import cluster`
    eval_pkg.project_to_null = eval_eval.project_to_null
    eval_pkg.generative_restrictiveness = eval_eval.generative_restrictiveness
    eval_pkg.cluster = importlib.import_module("scrubvae.eval.cluster")
    eval_metrics = importlib.import_module("scrubvae.eval.metrics")
    return types.SimpleNamespace(ev=eval_eval, met=eval_metrics)


# ---------------------------------------------------------------------------
# rand_cv decodability family (reference eval/metrics.py:231-305)
# ---------------------------------------------------------------------------


def _latents(n=600, d=12, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(n, d)).astype(np.float64)
    w = rng.normal(size=(d, 2))
    y_cont = z @ w + rng.normal(size=(n, 2)) * 0.3
    y_cls = (z[:, 0] + 0.5 * z[:, 1] > 0).astype(np.int64)[:, None]
    return z, y_cont, y_cls


class TestRandCVParity:
    """Same z/y arrays through both stacks: the downsample convention,
    fold split (KFold shuffle seed 100) and per-fold estimators must
    produce the same per-fold numbers."""

    def test_linear(self, ref):
        z, y, _ = _latents()
        ours = our_metrics.linear_rand_cv(z, y, 17, 5)
        theirs = ref.met.linear_rand_cv(z, y, 17, 5)
        np.testing.assert_allclose(ours, theirs, rtol=1e-8)

    def test_qda_lda(self, ref):
        # window 5 keeps ~96 train rows/fold so per-class counts clear the
        # svd-solver full-rank requirement in both stacks
        z, _, y = _latents(n=600, d=8, seed=1)
        np.testing.assert_allclose(
            our_metrics.qda_rand_cv(z, y, 5, 5),
            ref.met.qda_rand_cv(z, y, 5, 5),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            our_metrics.lda_rand_cv(z, y, 5, 5),
            ref.met.lda_rand_cv(z, y, 5, 5),
            rtol=1e-12,
        )

    def test_log_class(self, ref):
        z, _, y = _latents(n=600, d=8, seed=2)
        ours = our_metrics.log_class_rand_cv(z, y, 5, 5)
        try:
            theirs = ref.met.log_class_rand_cv(z, y, 5, 5)
        except TypeError:
            pytest.skip(
                "installed sklearn removed LogisticRegression(multi_class=)"
                " — reference call signature no longer constructible"
            )
        # saga is iterative; accuracies agree to the fold level
        np.testing.assert_allclose(ours, theirs, atol=0.02)

    def test_log_class_multiclass(self, ref):
        """Multiclass (4-way) logistic decodability. The reference forces
        ``multi_class="ovr"`` (eval/metrics.py:274); since round 4 the
        default here reproduces that formulation explicitly via
        ``OneVsRestClassifier`` (VERDICT r3 #8) — asserted fold-for-fold
        against a hand-built OVR baseline, and against the reference itself
        wherever the installed sklearn still accepts its signature.
        ``multi_class="multinomial"`` remains the opt-in modern probe."""
        rng = np.random.default_rng(7)
        n, d, k = 800, 8, 4
        centers = rng.normal(size=(k, d)) * 2.0
        y = np.repeat(np.arange(k), n // k)
        rng.shuffle(y)
        z = centers[y] + rng.normal(size=(n, d))
        y = y.astype(np.int64)[:, None]
        ours = our_metrics.log_class_rand_cv(z, y, 5, 5)
        # well-separated clusters: the probe must decode well regardless of
        # the multinomial-vs-OVR formulation
        assert np.mean(ours) > 0.9

        # fold-for-fold equality with an explicit one-vs-rest baseline
        # (what the removed multi_class="ovr" kwarg dispatched to)
        from sklearn.linear_model import LogisticRegression
        from sklearn.model_selection import KFold
        from sklearn.multiclass import OneVsRestClassifier

        dz, dy = z[::5], y[::5].ravel()
        kf = KFold(n_splits=5, shuffle=True, random_state=100)
        expected = []
        for train_i, test_i in kf.split(dz):
            clf = OneVsRestClassifier(
                LogisticRegression(
                    l1_ratio=0.5, penalty="elasticnet", solver="saga",
                    max_iter=300,
                )
            ).fit(dz[train_i], dy[train_i])
            expected.append((dy[test_i] == clf.predict(dz[test_i])).mean())
        np.testing.assert_allclose(ours, expected, rtol=1e-12)

        # the opt-in multinomial probe is a genuinely different fit
        ours_mn = our_metrics.log_class_rand_cv(
            z, y, 5, 5, multi_class="multinomial"
        )
        assert np.mean(ours_mn) > 0.9

    def test_log_class_multiclass_vs_reference(self, ref):
        """Direct reference comparison of the 4-way probe — only
        constructible while the installed sklearn accepts the reference's
        multi_class= signature (the OneVsRest-baseline equality above runs
        unconditionally)."""
        rng = np.random.default_rng(7)
        n, d, k = 800, 8, 4
        centers = rng.normal(size=(k, d)) * 2.0
        y = np.repeat(np.arange(k), n // k)
        rng.shuffle(y)
        z = centers[y] + rng.normal(size=(n, d))
        y = y.astype(np.int64)[:, None]
        try:
            theirs = ref.met.log_class_rand_cv(z, y, 5, 5)
        except TypeError:
            pytest.skip(
                "installed sklearn removed LogisticRegression(multi_class=)"
                " — reference signature not constructible; OVR parity"
                " asserted against the explicit OneVsRest baseline in"
                " test_log_class_multiclass"
            )
        ours = our_metrics.log_class_rand_cv(z, y, 5, 5)
        np.testing.assert_allclose(ours, theirs, atol=0.03)

    def test_parkinsons_fold_convention(self, ref):
        """The parkinsons classification folds downsample by window//stride
        (stride 10) — reference eval/metrics.py:160,204-211. Drive a probe
        function through BOTH rand_cv decorators and compare the fold index
        sets themselves."""
        n, window = 2040, 51
        z = np.arange(n, dtype=np.float64)[:, None]  # z values ARE indices
        y = np.zeros((n, 1), dtype=np.int64)

        def probe(z_train, y_train, z_test, y_test):
            return (
                tuple(z_train[:, 0].astype(int).tolist()),
                tuple(z_test[:, 0].astype(int).tolist()),
            )

        cw = our_metrics.decodability_class_window("parkinsons", window)
        assert cw == window // 10 == 5
        ours = our_metrics.rand_cv(probe)(z, y, cw, 5)
        theirs = ref.met.rand_cv(probe)(z, y, window // 10, 5)
        assert ours == theirs
        # and 4_mice keeps the full-window interval
        assert our_metrics.decodability_class_window("4_mice", window) == window
        # the two conventions genuinely differ (10x the rows per fold)
        full = our_metrics.rand_cv(probe)(z, y, window, 5)
        assert len(full[0][0]) * 10 // 2 < len(ours[0][0])


class TestMLPProbeParity:
    """MLP decodability probe differential (VERDICT r4 missing #3).

    The reference trains a torch MLP (in->in->in->out ReLU) 200 epochs of
    full-batch AdamW(1e-3) with sum-MSE on cuda (eval/metrics.py:301-329);
    ours is the same architecture/optimizer/loss/epochs in JAX with a
    scanned fit (evals/metrics.py:189-253). Inits are different RNG
    streams (torch default vs jax.random), so per-fold equality is
    stochastic — the comparison is a tolerance band on identical KFold
    folds (seed 100) over a high-SNR synthetic task where both fits
    converge: per-fold R^2 within 0.1, means within 0.05."""

    def _task(self, n=400, d=16, out=3, seed=3):
        rng = np.random.default_rng(seed)
        z = rng.normal(size=(n, d)).astype(np.float32)
        w = rng.normal(size=(d, out)).astype(np.float32) / np.sqrt(d)
        y = np.tanh(z @ w) * 2.0 + rng.normal(size=(n, out)).astype(
            np.float32
        ) * 0.05
        return z, y.astype(np.float32)

    def test_mlp_probe_tolerance_band(self, ref, monkeypatch):
        z, y = self._task()

        # reference train_MLP is hardcoded cuda (metrics.py:308-311):
        # neutralize the device moves so it runs on this CPU-only torch
        monkeypatch.setattr(
            torch.nn.Module, "cuda", lambda self, *a, **k: self
        )
        monkeypatch.setattr(
            torch.Tensor, "cuda", lambda self, *a, **k: self
        )

        class _TorchShim:
            def __getattr__(self, k):
                return getattr(torch, k)

            @staticmethod
            def tensor(*a, **kw):
                kw.pop("device", None)
                return torch.tensor(*a, **kw)

        monkeypatch.setattr(ref.met, "torch", _TorchShim())

        torch.manual_seed(0)
        theirs = np.asarray(
            ref.met.mlp_rand_cv(torch.from_numpy(z), y, 1, 5), dtype=float
        )
        ours = np.asarray(our_metrics.mlp_rand_cv(z, y, 1, 5), dtype=float)
        assert len(ours) == len(theirs) == 5
        # both probes fit the high-SNR task
        assert ours.mean() > 0.5 and theirs.mean() > 0.5, (ours, theirs)
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=0.1)
        assert abs(ours.mean() - theirs.mean()) <= 0.05, (ours, theirs)


class TestAuxMetricParity:
    def test_mmd(self, ref):
        rng = np.random.default_rng(3)
        X = rng.normal(size=(100, 5))
        Y = rng.normal(size=(80, 5)) + 0.5
        np.testing.assert_allclose(
            our_metrics.mmd_estimate(X, Y), ref.met.mmd_estimate(X, Y), rtol=1e-10
        )
        np.testing.assert_allclose(
            our_metrics.mmd_estimate(X, Y, h=2.0),
            ref.met.mmd_estimate(X, Y, h=2.0),
            rtol=1e-10,
        )

    def test_entropy_and_hungarian(self, ref):
        rng = np.random.default_rng(4)
        x = rng.integers(0, 6, size=400)
        np.testing.assert_allclose(
            our_metrics.shannon_entropy(x), ref.met.shannon_entropy(x), rtol=1e-12
        )
        # a permuted relabeling of x, plus noise
        perm = rng.permutation(6)
        y = perm[x]
        y[:40] = rng.integers(0, 6, size=40)
        np.testing.assert_array_equal(
            our_metrics.hungarian_match(x, y), ref.met.hungarian_match(x, y)
        )


# ---------------------------------------------------------------------------
# Generative restrictiveness (reference eval/eval.py:22-120)
# ---------------------------------------------------------------------------


class _RefCannedModel:
    """Reference-side stub: decode ignores (z, data) and returns canned
    tensors, so the test isolates the deterministic re-measurement math."""

    def __init__(self, x6d, root, window):
        self._out = {
            "x6d": torch.from_numpy(x6d),
            "root": torch.from_numpy(root),
        }
        self.window = window

    def decode(self, z, data):
        return dict(self._out)


class _OurCannedModel:
    """Duck-typed stand-in for the flax module: restrictiveness only calls
    ``model.apply(vars, z, data, train=False, method=model.decode)``."""

    decode = "decode"

    def __init__(self, x6d, root):
        self._out = {"x6d": jnp.asarray(x6d), "root": jnp.asarray(root)}

    def apply(self, variables, z, data, train, method):
        return dict(self._out)


def _gen_restrict_inputs(seed=5, B=6, W=17):
    rng = np.random.default_rng(seed)
    J = SKEL.tree.n_joints
    # decoded cont6d near identity rotations + noise, decoded root walk
    eye6 = np.tile(
        np.array([1, 0, 0, 0, 1, 0], np.float32), (B, W, J, 1)
    )
    x6d = (eye6 + rng.normal(size=(B, W, J, 6)) * 0.2).astype(np.float32)
    root = np.cumsum(
        rng.normal(size=(B, W, 3)) * 0.5, axis=1
    ).astype(np.float32)
    offsets = np.broadcast_to(
        (np.asarray(SKEL.tree.offsets) * 20.0).astype(np.float32), (B, W, J, 3)
    ).copy()
    yaw = rng.uniform(-np.pi, np.pi, size=(B, 1)).astype(np.float32)
    data = {
        "x6d": x6d * 0.0,  # encoder-side window, only shapes are read
        "offsets": offsets,
        "heading": np.concatenate([np.sin(yaw), np.cos(yaw)], -1).astype(
            np.float32
        ),
        "avg_speed_3d": rng.normal(size=(B, 3)).astype(np.float32) * 0.5,
    }
    z = rng.normal(size=(B, 8)).astype(np.float32)
    return x6d, root, data, z


@pytest.mark.parametrize("key", ["heading", "avg_speed_3d"])
def test_generative_restrictiveness_remeasure_parity(ref, key):
    x6d, root, data, z = _gen_restrict_inputs()
    B, W = x6d.shape[:2]

    tdata = {k: torch.from_numpy(np.asarray(v)) for k, v in data.items()}
    ref_model = _RefCannedModel(x6d, root, W)
    tree = [list(c) for c in SKEL.tree.chains]
    pred_ref, _ = ref.ev.generative_restrictiveness(
        ref_model, torch.from_numpy(z), tdata, key, tree
    )

    our_model = _OurCannedModel(x6d, root)
    norm_params = {
        # the reference hardcodes these stats (eval/eval.py:106-117)
        "avg_speed_3d": {
            "mean": np.array([0.4993, 0.7112, 0.6663], np.float32),
            "std": np.array([0.4038, 0.3586, 0.4169], np.float32),
        }
    }
    pred_ours, _ = generative_restrictiveness_batch(
        our_model,
        {"params": {}},
        jnp.asarray(z),
        {k: jnp.asarray(v) for k, v in data.items()},
        key,
        SKEL.tree,
        jax.random.PRNGKey(0),
        norm_params=norm_params,
    )
    np.testing.assert_allclose(
        np.asarray(pred_ours),
        pred_ref.detach().numpy(),
        rtol=1e-3,
        atol=1e-4,
    )
