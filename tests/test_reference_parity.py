"""Differential parity tests against the reference implementation.

Loads the reference's pure-math modules (torch CPU / numpy) directly from
the read-only checkout at /root/reference, with stub packages for the heavy
dependencies those files import but these code paths never touch, and checks
our JAX ops reproduce the same numbers on random inputs:

- quaternion library        (reference src/scrubvae/data/quaternion.py)
- rotation conversions      (reference src/scrubvae/data/rotation_conversion.py)
- inverse/forward kinematics (reference src/scrubvae/data/dataset.py:11-116)
- loss primitives           (reference src/scrubvae/train/losses.py)

Skipped entirely when the reference checkout is absent (e.g. downstream
users running the public test suite).
"""

import importlib
import pathlib
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

REF = pathlib.Path("/root/reference/src")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")

from scrubvae_tpu.data.skeleton import load_skeleton  # noqa: E402
from scrubvae_tpu.ops import kinematics as kin  # noqa: E402
from scrubvae_tpu.ops import losses as our_losses  # noqa: E402
from scrubvae_tpu.ops import quaternion as qtn  # noqa: E402
from scrubvae_tpu.ops import rotation as rot  # noqa: E402

SKEL = load_skeleton("configs/mouse_skeleton.yaml")


@pytest.fixture(scope="module")
def ref():
    """Reference math modules, loaded without executing the package
    __init__ (which imports the full torch/neuroposelib/wandb stack)."""
    from _ref_stubs import install_ref_stubs

    install_ref_stubs()
    return types.SimpleNamespace(
        q=importlib.import_module("scrubvae.data.quaternion"),
        rc=importlib.import_module("scrubvae.data.rotation_conversion"),
        ds=importlib.import_module("scrubvae.data.dataset"),
        ls=importlib.import_module("scrubvae.train.losses"),
    )


def rand_quat(rng, shape):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def t(x):
    return torch.from_numpy(np.asarray(x))


def allclose(ours, theirs, rtol=1e-4, atol=1e-5, msg=""):
    np.testing.assert_allclose(
        np.asarray(ours),
        np.asarray(theirs.detach().numpy() if torch.is_tensor(theirs) else theirs),
        rtol=rtol,
        atol=atol,
        err_msg=msg,
    )


class TestQuaternionParity:
    def test_qmul_qrot_qinv(self, ref):
        rng = np.random.default_rng(0)
        q = rand_quat(rng, (64,))
        r = rand_quat(rng, (64,))
        v = rng.normal(size=(64, 3)).astype(np.float32)
        allclose(qtn.qmul(jnp.asarray(q), jnp.asarray(r)), ref.q.qmul(t(q), t(r)))
        allclose(qtn.qrot(jnp.asarray(q), jnp.asarray(v)), ref.q.qrot(t(q), t(v)))
        allclose(qtn.qinv(jnp.asarray(q)), ref.q.qinv(t(q)))

    def test_qeuler_and_back(self, ref):
        rng = np.random.default_rng(1)
        q = rand_quat(rng, (32,))
        for order in ("xyz", "zyx", "yzx"):
            allclose(
                qtn.qeuler(jnp.asarray(q), order, deg=True),
                ref.q.qeuler(t(q), order, deg=True),
                msg=f"qeuler {order}",
            )
        e = (rng.uniform(-0.4, 0.4, size=(32, 3)) * 57.29578).astype(np.float32)
        allclose(
            qtn.euler_to_quaternion(jnp.asarray(e), "xyz", deg=True),
            ref.q.euler2quat(t(e), "xyz", deg=True),
            msg="euler2quat",
        )

    def test_qfix_expmap(self, ref):
        rng = np.random.default_rng(2)
        q = rand_quat(rng, (5, 16))  # (L, J) sequence layout
        allclose(qtn.qfix(jnp.asarray(q)), ref.q.qfix(q))
        e = rng.normal(size=(32, 3)).astype(np.float32) * 0.5
        allclose(
            qtn.expmap_to_quaternion(jnp.asarray(e)),
            ref.q.expmap_to_quaternion(e),
        )

    def test_cont6d_roundtrip(self, ref):
        rng = np.random.default_rng(3)
        q = rand_quat(rng, (48,))
        c_ours = qtn.quaternion_to_cont6d(jnp.asarray(q))
        c_ref = ref.q.quaternion_to_cont6d(t(q))
        allclose(c_ours, c_ref)
        allclose(
            qtn.cont6d_to_matrix(c_ours, eps=1e-8),
            ref.q.cont6d_to_matrix(c_ref, eps=1e-8),
        )
        allclose(
            qtn.quaternion_to_matrix(jnp.asarray(q)),
            ref.q.quaternion_to_matrix(t(q)),
        )

    def test_qpow_qbetween_lerp(self, ref):
        rng = np.random.default_rng(4)
        # NOTE: the reference's qpow/qslerp themselves crash under modern
        # torch (quaternion.py:370 does `1 - mask` on a bool tensor, removed
        # in torch>=1.5), so qpow parity is checked against the analytic
        # identity qpow(exp(aa), t) == exp(t*aa) instead of the reference.
        aa = (rng.normal(size=(16, 3)) * 0.6).astype(np.float32)
        q0 = rot.axis_angle_to_quaternion(jnp.asarray(aa))
        for s in (0.25, 0.5, 0.75):  # qpow broadcasts t against q0
            np.testing.assert_allclose(
                np.asarray(qtn.qpow(q0, s)),
                np.asarray(rot.axis_angle_to_quaternion(jnp.asarray(aa * s))),
                rtol=1e-3,
                atol=1e-4,
                err_msg=f"t={s}",
            )
        tt = rng.uniform(0.1, 0.9, size=(16,)).astype(np.float32)
        v0 = rng.normal(size=(16, 3)).astype(np.float32)
        v1 = rng.normal(size=(16, 3)).astype(np.float32)
        allclose(
            qtn.qbetween(jnp.asarray(v0), jnp.asarray(v1)),
            ref.q.qbetween(t(v0), t(v1)),
        )
        allclose(
            qtn.lerp(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(tt[:, None])),
            ref.q.lerp(t(v0), t(v1), t(tt[:, None])),
        )


class TestRotationConversionParity:
    def test_rotation6d(self, ref):
        rng = np.random.default_rng(5)
        d6 = rng.normal(size=(40, 6)).astype(np.float32)
        m_ours = rot.rotation_6d_to_matrix(jnp.asarray(d6))
        m_ref = ref.rc.rotation_6d_to_matrix(t(d6))
        allclose(m_ours, m_ref)
        allclose(rot.matrix_to_rotation_6d(m_ours), ref.rc.matrix_to_rotation_6d(m_ref))

    def test_quaternion_matrix(self, ref):
        rng = np.random.default_rng(6)
        q = rand_quat(rng, (40,))
        m_ours = rot.quaternion_to_matrix(jnp.asarray(q)) if hasattr(rot, "quaternion_to_matrix") else qtn.quaternion_to_matrix(jnp.asarray(q))
        m_ref = ref.rc.quaternion_to_matrix(t(q))
        allclose(m_ours, m_ref)
        allclose(
            rot.standardize_quaternion(rot.matrix_to_quaternion(m_ours)),
            ref.rc.standardize_quaternion(ref.rc.matrix_to_quaternion(m_ref)),
            rtol=1e-3,
            atol=1e-4,
        )

    def test_euler_matrix(self, ref):
        rng = np.random.default_rng(7)
        e = rng.uniform(-1.2, 1.2, size=(32, 3)).astype(np.float32)
        for conv in ("XYZ", "ZYX"):
            m_ours = rot.euler_angles_to_matrix(jnp.asarray(e), conv)
            m_ref = ref.rc.euler_angles_to_matrix(t(e), conv)
            allclose(m_ours, m_ref, msg=conv)
            allclose(
                rot.matrix_to_euler_angles(m_ours, conv),
                ref.rc.matrix_to_euler_angles(m_ref, conv),
                rtol=1e-3,
                atol=1e-4,
                msg=conv,
            )

    def test_canonicalize_smplh(self, ref):
        rng = np.random.default_rng(16)
        B, T, J = 2, 6, 5
        aa = (rng.normal(size=(B, T, J, 3)) * 0.5).astype(np.float32)
        poses = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(aa)))
        trans = rng.normal(size=(B, T, 3)).astype(np.float32)
        xc_ours, tr_ours = rot.canonicalize_smplh(
            jnp.asarray(poses), jnp.asarray(trans)
        )
        xc_ref, tr_ref = ref.rc.canonicalize_smplh(t(poses), t(trans))
        allclose(xc_ours, xc_ref, rtol=1e-3, atol=1e-4)
        allclose(tr_ours, tr_ref, rtol=1e-3, atol=1e-4)

    def test_axis_angle(self, ref):
        rng = np.random.default_rng(8)
        aa = (rng.normal(size=(32, 3)) * 0.8).astype(np.float32)
        allclose(
            rot.axis_angle_to_matrix(jnp.asarray(aa)),
            ref.rc.axis_angle_to_matrix(t(aa)),
        )
        allclose(
            rot.axis_angle_to_quaternion(jnp.asarray(aa)),
            ref.rc.axis_angle_to_quaternion(t(aa)),
        )
        m = ref.rc.axis_angle_to_matrix(t(aa))
        # near-zero rotations make the axis ill-conditioned in f32
        allclose(
            rot.matrix_to_axis_angle(jnp.asarray(m.numpy())),
            ref.rc.matrix_to_axis_angle(m),
            rtol=1e-3,
            atol=1e-3,
        )


class TestKinematicsParity:
    def test_inv_kin(self, ref):
        rng = np.random.default_rng(9)
        base = np.asarray(SKEL.tree.offsets) * 20.0
        pose = (
            base[None] + rng.normal(size=(12, SKEL.tree.n_joints, 3)) * 3.0
        ).astype(np.float32)
        ours = kin.inv_kin(jnp.asarray(pose), SKEL.tree, forward_indices=[0, 1])
        theirs = ref.ds.inv_kin(
            pose.astype(np.float64),
            [list(c) for c in SKEL.tree.chains],
            np.asarray(SKEL.tree.offsets, dtype=np.float64),
            forward_indices=[0, 1],
        )
        # reference overwrites sample 0's root rotation with identity
        # (dataset.py:33, a documented quirk we do not replicate) - compare
        # samples 1+ only.
        np.testing.assert_allclose(
            np.asarray(ours)[1:], theirs[1:], rtol=1e-3, atol=1e-4
        )

    def test_fwd_kin_cont6d(self, ref):
        rng = np.random.default_rng(10)
        B, J = 16, SKEL.tree.n_joints
        q = rand_quat(rng, (B, J))
        c6d = np.asarray(qtn.quaternion_to_cont6d(jnp.asarray(q)))
        offs = (np.asarray(SKEL.tree.offsets) * 20.0).astype(np.float32)
        root = rng.normal(size=(B, 3)).astype(np.float32)
        for do_root_R in (True, False):
            ours = kin.fwd_kin_cont6d(
                jnp.asarray(c6d),
                SKEL.tree,
                jnp.broadcast_to(jnp.asarray(offs), (B, J, 3)),
                root_pos=jnp.asarray(root),
                do_root_R=do_root_R,
                eps=1e-8,
            )
            theirs = ref.ds.fwd_kin_cont6d_torch(
                t(c6d),
                [list(c) for c in SKEL.tree.chains],
                t(offs),
                root_pos=t(root),
                do_root_R=do_root_R,
                eps=1e-8,
            )
            allclose(ours, theirs, rtol=1e-3, atol=1e-3, msg=f"do_root_R={do_root_R}")

    def test_ik_fk_roundtrip_matches_reference_roundtrip(self, ref):
        """IK then FK recovers the pose identically in both stacks (the
        core preprocessing invariant, reference dataset.py:438-449)."""
        rng = np.random.default_rng(11)
        base = np.asarray(SKEL.tree.offsets) * 20.0
        pose = (
            base[None] + rng.normal(size=(8, SKEL.tree.n_joints, 3)) * 2.0
        ).astype(np.float32)
        seg = kin.segment_lengths(jnp.asarray(pose), SKEL.tree)
        lq = kin.inv_kin(jnp.asarray(pose), SKEL.tree, forward_indices=[0, 1])
        c6d = qtn.quaternion_to_cont6d(lq)
        rec = kin.fwd_kin_cont6d(
            c6d,
            SKEL.tree,
            seg,
            root_pos=jnp.asarray(pose[:, 0]),
            do_root_R=True,
            eps=1e-8,
        )
        np.testing.assert_allclose(np.asarray(rec), pose, atol=0.05)
        rec_ref = ref.ds.fwd_kin_cont6d_torch(
            t(np.asarray(c6d)),
            [list(c) for c in SKEL.tree.chains],
            t(np.asarray(seg)),
            root_pos=t(pose[:, 0]),
            do_root_R=True,
            eps=1e-8,
        )
        np.testing.assert_allclose(rec_ref.numpy(), pose, atol=0.05)


class TestLossParity:
    def test_rotation_losses(self, ref):
        rng = np.random.default_rng(12)
        x = rng.normal(size=(8, 20, 6)).astype(np.float32)
        xh = (x + rng.normal(size=x.shape) * 0.1).astype(np.float32)
        allclose(
            our_losses.rotation_loss(jnp.asarray(x), jnp.asarray(xh)),
            ref.ls.rotation_loss(t(x), t(xh)),
            rtol=1e-3,
        )
        allclose(
            our_losses.stable_rotation_loss(jnp.asarray(x), jnp.asarray(xh)),
            ref.ls.stable_rotation_loss(t(x), t(xh)),
            rtol=1e-3,
        )

    def test_prior_loss(self, ref):
        rng = np.random.default_rng(13)
        B, D = 16, 8
        mu = rng.normal(size=(B, D)).astype(np.float32)
        L = np.tril(rng.normal(size=(B, D, D)).astype(np.float32) * 0.2)
        diag = np.abs(rng.normal(size=(B, D)).astype(np.float32)) + 0.5
        L[:, np.arange(D), np.arange(D)] = diag
        allclose(
            our_losses.prior_loss(jnp.asarray(mu), jnp.asarray(L)),
            ref.ls.prior_loss(t(mu), t(L)),
            rtol=1e-4,
        )

    def test_mpjpe_loss(self, ref):
        rng = np.random.default_rng(14)
        B, W, J = 4, 5, SKEL.tree.n_joints
        q = rand_quat(rng, (B, W, J))
        x6d = np.asarray(qtn.quaternion_to_cont6d(jnp.asarray(q)))
        offs = np.broadcast_to(
            (np.asarray(SKEL.tree.offsets) * 20.0).astype(np.float32),
            (B, W, J, 3),
        ).copy()
        target = rng.normal(size=(B, W, J, 3)).astype(np.float32) * 10.0
        ours = our_losses.mpjpe_loss(
            jnp.asarray(target), jnp.asarray(x6d), SKEL.tree, jnp.asarray(offs)
        )
        theirs = ref.ls.mpjpe_loss(
            t(target),
            t(x6d),
            [list(c) for c in SKEL.tree.chains],
            t(offs),
        )
        allclose(ours, theirs, rtol=1e-3)

    def test_direct_lsq_and_total_correlation(self, ref):
        rng = np.random.default_rng(15)
        B, D = 32, 6
        z = rng.normal(size=(B, D)).astype(np.float32)
        y = rng.normal(size=(B, 2)).astype(np.float32)
        allclose(
            our_losses.direct_lsq_loss(jnp.asarray(z), jnp.asarray(y)),
            ref.ls.direct_lsq_loss(t(z), t(y)),
            rtol=1e-3,
        )
        mu = rng.normal(size=(B, D)).astype(np.float32)
        L = np.tril(rng.normal(size=(B, D, D)).astype(np.float32) * 0.1)
        L[:, np.arange(D), np.arange(D)] = (
            np.abs(rng.normal(size=(B, D)).astype(np.float32)) + 0.5
        )
        allclose(
            our_losses.total_correlation(
                jnp.asarray(z), jnp.asarray(mu), jnp.asarray(L)
            ),
            ref.ls.total_correlation(t(z), t(mu), t(L)),
            rtol=1e-3,
            atol=1e-4,
        )
