"""Unit tests for the math core: quaternions, rotations, kinematics, losses.

Strategy (SURVEY.md section 4): closed-form identities, round-trips, and
independent re-derivations (naive per-chain numpy loops mirroring the
reference's algorithm structure) compared against the vectorized JAX ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scrubvae_tpu.data.skeleton import load_skeleton
from scrubvae_tpu.ops import kinematics as kin
from scrubvae_tpu.ops import losses
from scrubvae_tpu.ops import quaternion as qtn
from scrubvae_tpu.ops import rotation as rot

SKEL = load_skeleton("configs/mouse_skeleton.yaml")


def rand_quats(key, shape):
    q = jax.random.normal(key, shape + (4,))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_qmul_identity_and_inverse(self):
        key = jax.random.PRNGKey(0)
        q = rand_quats(key, (32,))
        ident = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (32, 1))
        np.testing.assert_allclose(qtn.qmul(q, ident), q, atol=1e-6)
        np.testing.assert_allclose(qtn.qmul(ident, q), q, atol=1e-6)
        np.testing.assert_allclose(
            qtn.qmul(q, qtn.qinv(q)), ident, atol=1e-5
        )

    def test_qrot_matches_matrix(self):
        key = jax.random.PRNGKey(1)
        q = rand_quats(key, (16,))
        v = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
        R = qtn.quaternion_to_matrix(q)
        np.testing.assert_allclose(
            qtn.qrot(q, v), jnp.einsum("bij,bj->bi", R, v), atol=1e-5
        )

    def test_qmul_composes_like_matrices(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        q1, q2 = rand_quats(k1, (8,)), rand_quats(k2, (8,))
        R = qtn.quaternion_to_matrix(qtn.qmul(q1, q2))
        R12 = qtn.quaternion_to_matrix(q1) @ qtn.quaternion_to_matrix(q2)
        np.testing.assert_allclose(R, R12, atol=1e-5)

    def test_qbetween(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(4))
        v0 = jax.random.normal(k1, (64, 3))
        v1 = jax.random.normal(k2, (64, 3))
        q = qtn.qbetween(v0, v1)
        v0n = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)
        v1n = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
        np.testing.assert_allclose(qtn.qrot(q, v0n), v1n, atol=1e-5)

    def test_cont6d_roundtrip(self):
        q = rand_quats(jax.random.PRNGKey(5), (32,))
        R = qtn.quaternion_to_matrix(q)
        c6d = qtn.quaternion_to_cont6d(q)
        np.testing.assert_allclose(qtn.cont6d_to_matrix(c6d), R, atol=1e-5)

    def test_qfix_continuity(self):
        q = rand_quats(jax.random.PRNGKey(6), (50, 3))
        # Inject random sign flips along time
        signs = jnp.where(
            jax.random.bernoulli(jax.random.PRNGKey(7), 0.5, (50, 1, 1)), -1.0, 1.0
        )
        fixed = qtn.qfix(q * signs)
        dots = jnp.sum(fixed[1:] * fixed[:-1], axis=-1)
        assert (dots >= 0).all()

    def test_euler_roundtrip(self):
        e = jax.random.uniform(
            jax.random.PRNGKey(8), (32, 3), minval=-1.0, maxval=1.0
        )
        q = qtn.euler_to_quaternion(e, "zyx", deg=False)
        e2 = qtn.qeuler(q, "zyx", deg=False)
        # qeuler returns angles as fixed (x, y, z) columns; re-composing with
        # the same order must reproduce the rotation.
        q2 = qtn.euler_to_quaternion(e2, "zyx", deg=False)
        np.testing.assert_allclose(
            qtn.quaternion_to_matrix(q), qtn.quaternion_to_matrix(q2), atol=1e-4
        )

    def test_qslerp_endpoints(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(9))
        q0, q1 = rand_quats(k1, (4,)), rand_quats(k2, (4,))
        out = qtn.qslerp(q0, q1, jnp.asarray([0.0, 1.0]))
        R_out = qtn.quaternion_to_matrix(out)
        np.testing.assert_allclose(
            R_out[0], qtn.quaternion_to_matrix(q0), atol=1e-4
        )
        np.testing.assert_allclose(
            R_out[1], qtn.quaternion_to_matrix(q1), atol=1e-4
        )

    def test_expmap(self):
        e = jax.random.normal(jax.random.PRNGKey(10), (16, 3)) * 0.5
        q = qtn.expmap_to_quaternion(e)
        q2 = rot.axis_angle_to_quaternion(e)
        np.testing.assert_allclose(q, q2, atol=1e-5)


class TestRotationConversions:
    def test_matrix_quaternion_roundtrip(self):
        R = rot.random_rotations(jax.random.PRNGKey(11), 64)
        q = rot.matrix_to_quaternion(R)
        np.testing.assert_allclose(rot.quaternion_to_matrix(q), R, atol=1e-5)

    def test_rotation_6d_roundtrip(self):
        R = rot.random_rotations(jax.random.PRNGKey(12), 64)
        d6 = rot.matrix_to_rotation_6d(R)
        np.testing.assert_allclose(rot.rotation_6d_to_matrix(d6), R, atol=1e-5)

    def test_axis_angle_roundtrip(self):
        aa = jax.random.normal(jax.random.PRNGKey(13), (32, 3))
        R = rot.axis_angle_to_matrix(aa)
        aa2 = rot.matrix_to_axis_angle(R)
        np.testing.assert_allclose(
            rot.axis_angle_to_matrix(aa2), R, atol=1e-4
        )

    def test_euler_matrix_roundtrip(self):
        e = jax.random.uniform(
            jax.random.PRNGKey(14), (32, 3), minval=-1.0, maxval=1.0
        )
        for conv in ["XYZ", "ZYX", "XZY"]:
            R = rot.euler_angles_to_matrix(e, conv)
            e2 = rot.matrix_to_euler_angles(R, conv)
            np.testing.assert_allclose(
                rot.euler_angles_to_matrix(e2, conv), R, atol=1e-4
            )

    def test_6d_matches_torch_convention(self):
        torch = pytest.importorskip("torch")
        d6 = np.random.default_rng(0).normal(size=(32, 6)).astype(np.float32)
        ours = np.asarray(rot.rotation_6d_to_matrix(jnp.asarray(d6)))
        # Independent torch implementation of Zhou et al. row Gram-Schmidt
        t = torch.from_numpy(d6)
        a1, a2 = t[..., :3], t[..., 3:]
        b1 = torch.nn.functional.normalize(a1, dim=-1)
        b2 = torch.nn.functional.normalize(
            a2 - (b1 * a2).sum(-1, keepdim=True) * b1, dim=-1
        )
        b3 = torch.cross(b1, b2, dim=-1)
        theirs = torch.stack([b1, b2, b3], dim=-2).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _naive_fk(cont6d, chains, offsets, root_pos, do_root_R=True, eps=0.0):
    """Independent numpy re-derivation of per-chain FK (reference algorithm
    structure: sequential matmuls along each chain)."""
    c6d_to_m = lambda c: np.asarray(qtn.cont6d_to_matrix(jnp.asarray(c), eps=eps))
    B, J = cont6d.shape[0], cont6d.shape[1]
    pose = np.zeros((B, J, 3))
    pose[:, 0] = root_pos
    for chain in chains:
        if do_root_R:
            matR = c6d_to_m(cont6d[:, 0])
        else:
            matR = np.tile(np.eye(3), (B, 1, 1))
        for i in range(1, len(chain)):
            matR = matR @ c6d_to_m(cont6d[:, chain[i]])
            off = offsets[:, chain[i]][..., None]
            pose[:, chain[i]] = (matR @ off).squeeze(-1) + pose[:, chain[i - 1]]
    return pose


def _rand_pose(key, batch=6):
    """Random plausible mouse pose: template FK'd from random rotations."""
    J = SKEL.n_keypts
    q = rand_quats(key, (batch, J))
    c6d = qtn.quaternion_to_cont6d(q)
    lengths = (
        jax.random.uniform(jax.random.PRNGKey(99), (batch, J, 1)) * 0.5 + 0.5
    )
    offsets = jnp.asarray(SKEL.offsets) * lengths
    root = jax.random.normal(jax.random.PRNGKey(98), (batch, 3))
    return kin.fwd_kin_cont6d(c6d, SKEL.tree, offsets, root)


class TestKinematics:
    def test_fk_matches_naive_chain_loop(self):
        key = jax.random.PRNGKey(20)
        B, J = 5, SKEL.n_keypts
        q = rand_quats(key, (B, J))
        c6d = qtn.quaternion_to_cont6d(q)
        offsets = np.random.default_rng(1).uniform(0.5, 1.5, (B, J, 1)).astype(
            np.float32
        ) * SKEL.offsets
        root = np.random.default_rng(2).normal(size=(B, 3)).astype(np.float32)
        ours = kin.fwd_kin_cont6d(
            c6d, SKEL.tree, jnp.asarray(offsets), jnp.asarray(root)
        )
        naive = _naive_fk(
            np.asarray(c6d), SKEL.kinematic_tree, offsets, root
        )
        np.testing.assert_allclose(np.asarray(ours), naive, atol=1e-4)

    def test_fk_no_root_rotation(self):
        key = jax.random.PRNGKey(21)
        B, J = 3, SKEL.n_keypts
        c6d = qtn.quaternion_to_cont6d(rand_quats(key, (B, J)))
        offsets = jnp.asarray(SKEL.offsets)
        root = jnp.zeros((B, 3))
        ours = kin.fwd_kin_cont6d(c6d, SKEL.tree, offsets, root, do_root_R=False)
        naive = _naive_fk(
            np.asarray(c6d),
            SKEL.kinematic_tree,
            np.tile(SKEL.offsets, (B, 1, 1)),
            np.zeros((B, 3)),
            do_root_R=False,
        )
        np.testing.assert_allclose(np.asarray(ours), naive, atol=1e-4)

    def test_ik_fk_roundtrip(self):
        pose = _rand_pose(jax.random.PRNGKey(22))
        local_q = kin.inv_kin(pose, SKEL.tree, forward_indices=[1, 0])
        c6d = qtn.quaternion_to_cont6d(local_q)
        offsets = kin.segment_lengths(pose, SKEL.tree)
        recon = kin.fwd_kin_cont6d(
            c6d, SKEL.tree, offsets, root_pos=pose[..., 0, :]
        )
        np.testing.assert_allclose(np.asarray(recon), np.asarray(pose), atol=1e-3)

    def test_ik_root_faces_target(self):
        pose = _rand_pose(jax.random.PRNGKey(23))
        local_q = kin.inv_kin(pose, SKEL.tree, forward_indices=[1, 0])
        fwd = pose[..., 0, :] - pose[..., 1, :]
        fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
        rotated = qtn.qrot(local_q[..., 0, :], fwd)
        target = jnp.zeros_like(rotated).at[..., 0].set(1.0)
        np.testing.assert_allclose(np.asarray(rotated), np.asarray(target), atol=1e-4)

    def test_segment_lengths(self):
        pose = _rand_pose(jax.random.PRNGKey(24))
        offs = kin.segment_lengths(pose, SKEL.tree)
        # Scaled offsets have norm equal to observed bone length.
        pp = SKEL.tree.pos_parent
        for j in range(1, SKEL.n_keypts):
            bone = np.linalg.norm(
                np.asarray(pose[..., j, :] - pose[..., pp[j], :]), axis=-1
            )
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(offs[..., j, :]), axis=-1),
                bone,
                atol=1e-4,
            )

    def test_speed_parts_matches_naive(self):
        pose = np.random.default_rng(3).normal(size=(7, 10, 18, 3)).astype(
            np.float32
        )
        parts = [[0, 1, 2, 3, 4, 5], [1, 6, 7, 8, 9, 10, 11], [5, 12, 13, 14, 15, 16, 17]]
        root_spd = np.diff(pose[..., 0, :], axis=-2) ** 2
        root_spd = np.sqrt(root_spd.sum(-1)).mean(-1)
        centered = pose - pose[..., 0:1, :]

        # Default = reference-EXACT semantics: the reference's part
        # centering indexes the WINDOW axis (dataset.py:149-151), which
        # np.diff cancels — every part's relative speed is root-centered
        # (pinned against the real reference in
        # test_preprocess_composition.py; PARITY.md deviation entry).
        ours = np.asarray(kin.speed_parts(jnp.asarray(pose), parts))
        naive = np.zeros((7, 4))
        naive[:, 0] = root_spd
        for i, part in enumerate(parts):
            rel = (np.diff(centered[..., part[1:], :], axis=-3) ** 2).sum(-1)
            naive[:, i + 1] = np.sqrt(rel).mean(axis=(-1, -2))
        np.testing.assert_allclose(ours, naive, atol=1e-5)

        # Opt-in intended semantics: true part-root (JOINT axis) centering
        ours_dev = np.asarray(
            kin.speed_parts(jnp.asarray(pose), parts, true_part_centering=True)
        )
        naive_dev = np.zeros((7, 4))
        naive_dev[:, 0] = root_spd
        for i, part in enumerate(parts):
            pp = centered if part[0] == 0 else centered - centered[:, :, part[0] : part[0] + 1, :]
            rel = (np.diff(pp[..., part[1:], :], axis=-3) ** 2).sum(-1)
            naive_dev[:, i + 1] = np.sqrt(rel).mean(axis=(-1, -2))
        np.testing.assert_allclose(ours_dev, naive_dev, atol=1e-5)
        assert np.abs(ours_dev[:, 2:] - ours[:, 2:]).max() > 1e-3

    def test_frame_yaw_and_angle2d(self):
        pose = _rand_pose(jax.random.PRNGKey(25))[:, :, :]
        yaw = kin.frame_yaw(pose)
        a2d = kin.angle2D(yaw[..., None])
        back = kin.angle_from_2D(a2d)[..., 0]
        np.testing.assert_allclose(np.asarray(back), np.asarray(yaw), atol=1e-5)

    def test_root_normalize_roundtrip(self):
        arena = jnp.asarray([[-300.0, -300.0, 0.0], [300.0, 300.0, 100.0]])
        root = jax.random.uniform(jax.random.PRNGKey(26), (10, 3)) * 100
        n = kin.normalize_root(root, arena)
        back = kin.inv_normalize_root(n, arena)
        np.testing.assert_allclose(np.asarray(back), np.asarray(root), atol=1e-4)


class TestLosses:
    def test_stable_rotation_loss_zero_at_identity(self):
        d6 = jax.random.normal(jax.random.PRNGKey(30), (4, 8, 6))
        assert float(losses.stable_rotation_loss(d6, d6)) < 1e-3

    def test_rotation_losses_agree_small_angles(self):
        R = rot.random_rotations(jax.random.PRNGKey(31), 16)
        d6 = rot.matrix_to_rotation_6d(R)
        # Perturb slightly
        d6_hat = d6 + 0.01 * jax.random.normal(jax.random.PRNGKey(32), d6.shape)
        a = float(losses.rotation_loss(d6.reshape(16, 1, 6), d6_hat.reshape(16, 1, 6)))
        b = float(
            losses.stable_rotation_loss(
                d6.reshape(16, 1, 6), d6_hat.reshape(16, 1, 6)
            )
        ) / 16.0
        assert abs(a - b) / max(a, 1e-9) < 0.05

    def test_prior_loss_diag_closed_form(self):
        B, D = 8, 5
        mu = jax.random.normal(jax.random.PRNGKey(33), (B, D))
        sig = jax.random.uniform(jax.random.PRNGKey(34), (B, D)) + 0.5
        L = jnp.zeros((B, D, D)).at[:, jnp.arange(D), jnp.arange(D)].set(sig)
        ours = float(losses.prior_loss(mu, L))
        expected = float(
            jnp.sum(-0.5 * (1 + 2 * jnp.log(sig) - mu**2 - sig**2)) / B
        )
        assert abs(ours - expected) < 1e-4

    def test_prior_loss_zero_at_standard_normal(self):
        B, D = 4, 6
        mu = jnp.zeros((B, D))
        L = jnp.tile(jnp.eye(D), (B, 1, 1))
        assert abs(float(losses.prior_loss(mu, L))) < 1e-5

    def test_beta_prior_loss_matches_torch(self):
        torch = pytest.importorskip("torch")
        a = np.random.default_rng(4).uniform(1.1, 3.0, (6, 4)).astype(np.float32)
        b = np.random.default_rng(5).uniform(1.1, 3.0, (6, 4)).astype(np.float32)
        ours = float(losses.beta_prior_loss(jnp.asarray(a), jnp.asarray(b)))
        p = torch.distributions.Beta(torch.ones_like(torch.tensor(a)), torch.ones_like(torch.tensor(b)))
        q = torch.distributions.Beta(torch.tensor(a), torch.tensor(b))
        theirs = float(torch.distributions.kl_divergence(q, p).sum(-1).sum() / 6)
        assert abs(ours - theirs) < 1e-3

    def test_mpjpe_zero_for_exact_pose(self):
        pose = _rand_pose(jax.random.PRNGKey(35))[:, None]  # (B, 1, J, 3)
        local_q = kin.inv_kin(pose[:, 0], SKEL.tree, forward_indices=[1, 0])
        c6d = qtn.quaternion_to_cont6d(local_q)[:, None]
        offsets = kin.segment_lengths(pose[:, 0], SKEL.tree)[:, None]
        target = kin.fwd_kin_cont6d(
            c6d[:, 0], SKEL.tree, offsets[:, 0], jnp.zeros((pose.shape[0], 3))
        )[:, None]
        val = float(
            losses.mpjpe_loss(target, c6d, SKEL.tree, offsets)
        )
        assert val < 1e-6

    def test_total_correlation_matches_naive(self):
        B, D = 12, 4
        z = jax.random.normal(jax.random.PRNGKey(36), (B, D))
        mu = jax.random.normal(jax.random.PRNGKey(37), (B, D))
        sig = jax.random.uniform(jax.random.PRNGKey(38), (B, D)) + 0.5
        L = jnp.zeros((B, D, D)).at[:, jnp.arange(D), jnp.arange(D)].set(sig)
        ours = float(losses.total_correlation(z, mu, L))
        logvar = np.log(np.asarray(sig) ** 2)
        zn, mun = np.asarray(z), np.asarray(mu)
        lq = -0.5 * (
            np.exp(-logvar[None]) * (zn[:, None] - mun[None]) ** 2
            + logvar[None]
            + np.log(2 * np.pi)
        )
        from scipy.special import logsumexp

        log_qz_product = logsumexp(lq, axis=1).sum(-1)
        log_qz = logsumexp(lq.sum(-1), axis=1)
        expected = float(np.mean(log_qz - log_qz_product))
        assert abs(ours - expected) < 1e-3

    def test_direct_lsq_exact_fit(self):
        z = jax.random.normal(jax.random.PRNGKey(39), (32, 8))
        W = jax.random.normal(jax.random.PRNGKey(40), (8, 3))
        y = z @ W
        assert float(losses.direct_lsq_loss(z, y)) < 1e-3

    def test_direct_lsq_bias_column(self):
        """bias=True appends a ones column (reference losses.py:173-179):
        an affine target fits exactly only with the bias column, and the
        residual matches the numpy lstsq closed form."""
        z = np.asarray(jax.random.normal(jax.random.PRNGKey(41), (32, 8)))
        W = np.asarray(jax.random.normal(jax.random.PRNGKey(42), (8, 3)))
        y = z @ W + 5.0  # constant offset: not in span(z)
        no_bias = float(losses.direct_lsq_loss(jnp.asarray(z), jnp.asarray(y)))
        with_bias = float(
            losses.direct_lsq_loss(jnp.asarray(z), jnp.asarray(y), bias=True)
        )
        assert with_bias < 1e-3 < no_bias
        zb = np.concatenate([z, np.ones((32, 1), z.dtype)], axis=1)
        ref = float(((zb @ np.linalg.lstsq(zb, y, rcond=None)[0] - y) ** 2).sum())
        np.testing.assert_allclose(with_bias, ref, atol=1e-3)

    def test_direct_lsq_bias_from_negative_loss_weight(self):
        """compute_batch_loss derives the bias column from the sign of the
        configured loss weight — reference get_batch_loss convention
        ``bias=loss_scale[key+'_lsq'] < 0`` (losses.py:253-255), fixed from
        r1's hardcoded bias=False (VERDICT W4)."""
        from scrubvae_tpu.train.losses import compute_batch_loss

        rng = jax.random.PRNGKey(43)
        mu = jax.random.normal(rng, (16, 6))
        y = jax.random.normal(jax.random.PRNGKey(44), (16, 2)) + 3.0
        data = {"x6d": jnp.zeros((16, 4, 4, 6)), "avg_speed_3d": y}
        data_o = {"mu": mu, "x6d": jnp.zeros((16, 4, 4, 6))}
        dis = {"method": {"direct_lsq": ["avg_speed_3d"]}}

        def run(weight):
            bl, _ = compute_batch_loss(
                None,
                data,
                data_o,
                {"avg_speed_3d_lsq": jnp.asarray(weight)},
                dis,
                tree=None,
                scrub_state={},
                static_loss_scale={"avg_speed_3d_lsq": weight},
            )
            return float(bl["avg_speed_3d_lsq"])

        np.testing.assert_allclose(
            run(1.0), float(losses.direct_lsq_loss(mu, y, bias=False)), rtol=1e-5
        )
        np.testing.assert_allclose(
            run(-1.0), float(losses.direct_lsq_loss(mu, y, bias=True)), rtol=1e-5
        )


class TestDegenerateGradients:
    """The backward pass must stay finite on degenerate rotation inputs:
    an untrained decoder emits 6D rows that are near-zero or near-parallel,
    and TPU matmul rounding pushes them through exact zero, which the
    max(norm, eps)-style guards do not protect (norm's gradient is 0/0 at
    the origin). Regression for the ladder-config NaN at train step 76."""

    def _grad_finite(self, fn, *args):
        g = jax.grad(fn)(*args)
        assert np.isfinite(np.asarray(g)).all(), "non-finite gradient"

    def test_rotation6d_grad_on_degenerate_rows(self):
        cases = [
            jnp.zeros((1, 6)),  # both rows exactly zero
            jnp.asarray([[1.0, 0, 0, 1.0, 0, 0]]),  # a2 parallel to a1
            jnp.asarray([[1.0, 0, 0, 1.0, 1e-8, 0]]),  # near-parallel
            jnp.asarray([[1e-9, 0, 0, 0, 1e-9, 0]]),  # near-zero rows
        ]
        for d6 in cases:
            self._grad_finite(lambda x: jnp.sum(rot.rotation_6d_to_matrix(x)), d6)

    def test_cont6d_grad_on_degenerate_rows(self):
        cases = [
            jnp.zeros((1, 6)),
            jnp.asarray([[1.0, 0, 0, 1.0, 0, 0]]),
            jnp.asarray([[1e-9, 0, 0, 1e-9, 0, 0]]),
        ]
        for c in cases:
            self._grad_finite(
                lambda x: jnp.sum(qtn.cont6d_to_matrix(x, eps=1e-8)), c
            )

    def test_stable_rotation_loss_grad_at_exact_match(self):
        q = qtn.quaternion_to_cont6d(
            qtn.qnormalize(jax.random.normal(jax.random.PRNGKey(0), (4, 4)))
        )
        x = q.reshape(1, 4, 6)
        self._grad_finite(lambda a: losses.stable_rotation_loss(x, a), x)

    def test_mpjpe_grad_on_zero_rotations(self):
        B, W, J = 1, 2, SKEL.tree.n_joints
        x6d = jnp.zeros((B, W, J, 6))
        offsets = jnp.broadcast_to(
            jnp.asarray(SKEL.tree.offsets) * 20.0, (B, W, J, 3)
        )
        target = jnp.ones((B, W, J, 3))
        self._grad_finite(
            lambda a: losses.mpjpe_loss(target, a, SKEL.tree, offsets), x6d
        )

    def test_prior_loss_grad_with_underflowed_diag(self):
        """softplus(-200) underflows to exact 0 in f32; the CholeskyL floor
        must keep log(diag) and its gradient finite (full-ladder config
        went nan at epoch 8 from a collapsing posterior)."""
        import flax.linen as nn_  # noqa: F401
        from scrubvae_tpu.models.layers import CholeskyL

        for is_diag in (True, False):
            D = 4
            mod = CholeskyL(z_dim=D, is_diag=is_diag)
            n_out = D if is_diag else D * (D + 1) // 2
            x = jnp.full((2, n_out), -200.0)
            L = mod.apply({}, x)
            mu = jnp.ones((2, D))

            def f(xin):
                Lm = mod.apply({}, xin)
                return losses.prior_loss(mu, Lm)

            val = float(f(x))
            g = jax.grad(f)(x)
            assert np.isfinite(val)
            assert np.isfinite(np.asarray(g)).all()
            assert np.isfinite(np.asarray(L)).all()


class TestSmallSolve:
    """Unrolled SPD solves vs LAPACK (scrubvae_tpu/ops/smallsolve.py) -
    these replace jnp.linalg.solve in the scrubbers' hot path (TPU lowers
    small LU solves to sequential while loops; measured ~2 ms/step each)."""

    def _spd(self, rng, shape, n):
        a = rng.normal(size=shape + (n, n)).astype(np.float64)
        return a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(n)

    def test_solve_matches_lapack(self):
        from scrubvae_tpu.ops.smallsolve import spd_solve

        rng = np.random.default_rng(0)
        for shape, n, m in [((), 3, 5), ((4,), 7, 2), ((2, 3), 15, 512), ((), 1, 1)]:
            A = self._spd(rng, shape, n)
            B = rng.normal(size=shape + (n, m))
            ours = np.asarray(spd_solve(jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32)))
            ref = np.linalg.solve(A, B)
            np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_solve_vector_rhs(self):
        from scrubvae_tpu.ops.smallsolve import spd_solve

        rng = np.random.default_rng(1)
        A = self._spd(rng, (5,), 4)
        b = rng.normal(size=(5, 4))
        ours = np.asarray(spd_solve(jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)))
        ref = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_numpy_inputs(self):
        # host-side scrubber callers (e.g. torch-import head rebuilds) pass
        # raw numpy; the unroll must coerce rather than require .at
        from scrubvae_tpu.ops.smallsolve import spd_slogdet, spd_solve

        rng = np.random.default_rng(7)
        A = self._spd(rng, (3,), 5).astype(np.float32)
        B = rng.normal(size=(3, 5, 2)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(spd_solve(A, B)), np.linalg.solve(A, B), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(spd_slogdet(A)), np.linalg.slogdet(A)[1], rtol=1e-4, atol=1e-4
        )

    def test_slogdet_matches_lapack(self):
        from scrubvae_tpu.ops.smallsolve import spd_slogdet

        rng = np.random.default_rng(2)
        A = self._spd(rng, (6,), 8)
        ours = np.asarray(spd_slogdet(jnp.asarray(A, jnp.float32)))
        ref = np.linalg.slogdet(A)[1]
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_gradients_match_implicit_vjp(self):
        from scrubvae_tpu.ops.smallsolve import spd_solve

        rng = np.random.default_rng(3)
        A = jnp.asarray(self._spd(rng, (), 5), jnp.float32)
        B = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)

        g_ours = jax.grad(lambda a: jnp.sum(spd_solve(a, B) ** 2))(A)
        g_ref = jax.grad(lambda a: jnp.sum(jnp.linalg.solve(a, B) ** 2))(A)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), rtol=2e-3, atol=2e-3)

    def test_large_n_falls_back(self):
        from scrubvae_tpu.ops.smallsolve import SMALL_N_MAX, spd_solve

        rng = np.random.default_rng(4)
        n = SMALL_N_MAX + 8
        A = self._spd(rng, (), n)
        B = rng.normal(size=(n, 2))
        ours = np.asarray(spd_solve(jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32)))
        np.testing.assert_allclose(ours, np.linalg.solve(A, B), rtol=5e-3, atol=5e-3)
