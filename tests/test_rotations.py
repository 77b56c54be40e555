import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partmanip_tpu.ops import rotations as rot


def rand_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return rot.quat_unit(q)


class TestQuatBasics:
    def test_mul_identity(self):
        q = rand_quats(jax.random.PRNGKey(0), 16)
        qi = rot.quat_identity((16,))
        np.testing.assert_allclose(rot.quat_mul(q, qi), q, atol=1e-6)
        np.testing.assert_allclose(rot.quat_mul(qi, q), q, atol=1e-6)

    def test_mul_conjugate_is_identity(self):
        q = rand_quats(jax.random.PRNGKey(1), 16)
        r = rot.quat_mul(q, rot.quat_conjugate(q))
        np.testing.assert_allclose(r[:, :3], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.abs(r[:, 3]), 1.0, atol=1e-6)

    def test_rotate_matches_matrix(self):
        key = jax.random.PRNGKey(2)
        q = rand_quats(key, 32)
        v = jax.random.normal(jax.random.PRNGKey(3), (32, 3))
        rv = rot.quat_rotate(q, v)
        m = rot.quat_to_mat(q)
        np.testing.assert_allclose(rv, jnp.einsum("nij,nj->ni", m, v), atol=1e-5)

    def test_rotate_composition(self):
        a = rand_quats(jax.random.PRNGKey(4), 8)
        b = rand_quats(jax.random.PRNGKey(5), 8)
        v = jax.random.normal(jax.random.PRNGKey(6), (8, 3))
        lhs = rot.quat_rotate(rot.quat_mul(a, b), v)
        rhs = rot.quat_rotate(a, rot.quat_rotate(b, v))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_rotate_inverse(self):
        q = rand_quats(jax.random.PRNGKey(7), 8)
        v = jax.random.normal(jax.random.PRNGKey(8), (8, 3))
        np.testing.assert_allclose(
            rot.quat_rotate_inverse(q, rot.quat_rotate(q, v)), v, atol=1e-5
        )

    def test_angle_axis_roundtrip(self):
        angle = jnp.array([0.3, 1.2, -2.0])
        axis = rot.normalize(jnp.array([[1.0, 2.0, 3.0], [0, 0, 1], [1, -1, 0]]))
        q = rot.quat_from_angle_axis(angle, axis)
        # Rotating the axis by its own quat is a no-op.
        np.testing.assert_allclose(rot.quat_rotate(q, axis), axis, atol=1e-6)

    def test_quat_axis_z90(self):
        # 90° about z maps x→y.
        q = rot.quat_from_angle_axis(jnp.array(np.pi / 2), jnp.array([0.0, 0, 1]))
        np.testing.assert_allclose(rot.quat_axis(q[None], 0)[0], [0, 1, 0], atol=1e-6)


class TestMatConversions:
    def test_mat_quat_roundtrip(self):
        q = rand_quats(jax.random.PRNGKey(9), 64)
        q2 = rot.mat_to_quat(rot.quat_to_mat(q))
        # Same rotation up to sign.
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_mat_to_quat_edge_cases(self):
        # 180° rotations hit the non-w branches.
        for axis in [(1, 0, 0), (0, 1, 0), (0, 0, 1)]:
            q = rot.quat_from_angle_axis(jnp.array(np.pi), jnp.array(axis, dtype=jnp.float32))
            m = rot.quat_to_mat(q)
            q2 = rot.mat_to_quat(m)
            np.testing.assert_allclose(rot.quat_to_mat(q2), m, atol=1e-5)

    def test_euler_xyz(self):
        # yaw 90°: x→y
        q = rot.quat_from_euler_xyz(jnp.array(0.0), jnp.array(0.0), jnp.array(np.pi / 2))
        np.testing.assert_allclose(
            rot.quat_rotate(q[None], jnp.array([[1.0, 0, 0]]))[0], [0, 1, 0], atol=1e-6
        )
        # URDF rpy (-pi/2, 0, 0): y→-z (franka joint2 frame)
        q = rot.quat_from_euler_xyz(jnp.array(-np.pi / 2), jnp.array(0.0), jnp.array(0.0))
        np.testing.assert_allclose(
            rot.quat_rotate(q[None], jnp.array([[0.0, 1, 0]]))[0], [0, 0, -1], atol=1e-6
        )


class TestErrors:
    def test_orientation_error_zero(self):
        q = rand_quats(jax.random.PRNGKey(10), 8)
        np.testing.assert_allclose(rot.orientation_error(q, q), 0.0, atol=1e-6)

    def test_orientation_error_small_angle(self):
        q = rot.quat_identity((1,))
        d = rot.quat_from_angle_axis(jnp.array([0.01]), jnp.array([[0.0, 0, 1]]))
        err = rot.orientation_error(d, q)
        np.testing.assert_allclose(err[0], [0, 0, 0.005], atol=1e-6)

    def test_quat_diff_rad(self):
        q = rot.quat_identity((1,))
        d = rot.quat_from_angle_axis(jnp.array([0.7]), jnp.array([[1.0, 0, 0]]))
        np.testing.assert_allclose(rot.quat_diff_rad(d, q)[0], 0.7, atol=1e-5)

    def test_mat_diff_rad(self):
        a = rot.quat_from_angle_axis(jnp.array([1.1]), rot.normalize(jnp.array([[1.0, 1, 0]])))
        m1 = rot.quat_to_mat(rot.quat_identity((1,)))
        m2 = rot.quat_to_mat(a)
        np.testing.assert_allclose(rot.mat_diff_rad(m1, m2)[0], 1.1, atol=1e-5)


class TestDeambiguity:
    def test_group_closure(self):
        g = rot._OCTA
        assert g.shape == (24, 3, 3)
        # all orthogonal, det +1
        for m in g:
            np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-9)
            assert np.linalg.det(m) > 0.99
        # distinct
        flat = g.reshape(24, -1)
        assert len(np.unique(flat.round(6), axis=0)) == 24

    def test_symmetry_invariance(self):
        """q and q composed with any cube symmetry canonicalize identically."""
        q = rand_quats(jax.random.PRNGKey(11), 8)
        canon = rot.deambiguity_rotation(q)
        for k in [1, 5, 17]:
            s = jnp.asarray(rot._OCTA[k])
            m_sym = jnp.einsum("nij,jk->nik", rot.quat_to_mat(q), s)
            q_sym = rot.mat_to_quat(m_sym)
            canon2 = rot.deambiguity_rotation(q_sym)
            np.testing.assert_allclose(canon, canon2, atol=1e-4)

    def test_within_max_angle(self):
        """Canonical frame is within the cube symmetry fundamental domain
        (max geodesic distance to identity ~62°)."""
        q = rand_quats(jax.random.PRNGKey(12), 256)
        canon = rot.deambiguity_rotation(q)
        eye = jnp.broadcast_to(jnp.eye(3), canon.shape)
        ang = rot.mat_diff_rad(canon, eye)
        assert float(jnp.max(ang)) < 1.1  # 62.8° + slack

    def test_identity_fixed(self):
        q = rot.quat_identity((1,))
        np.testing.assert_allclose(rot.deambiguity_rotation(q)[0], np.eye(3), atol=1e-6)


class TestTransforms:
    def test_scale_unscale(self):
        lower = jnp.array([-1.0, 0.0])
        upper = jnp.array([3.0, 10.0])
        x = jnp.array([[1.0, 5.0], [-1.0, 0.0], [3.0, 10.0]])
        s = rot.scale_transform(x, lower, upper)
        np.testing.assert_allclose(s[1], [-1, -1], atol=1e-6)
        np.testing.assert_allclose(s[2], [1, 1], atol=1e-6)
        np.testing.assert_allclose(rot.unscale_transform(s, lower, upper), x, atol=1e-6)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(13)
        pa = jax.random.normal(key, (4, 3))
        qa = rand_quats(jax.random.PRNGKey(14), 4)
        pi, qi = rot.transform_inverse(pa, qa)
        p0, q0 = rot.transform_compose(pa, qa, pi, qi)
        np.testing.assert_allclose(p0, 0.0, atol=1e-5)
        np.testing.assert_allclose(jnp.abs(q0[:, 3]), 1.0, atol=1e-5)


class TestLinalg:
    def test_spd_solve_matches_numpy(self):
        from partmanip_tpu.ops.linalg import spd_solve
        rng = np.random.RandomState(0)
        B = rng.randn(16, 12, 12).astype(np.float32)
        A = np.einsum("eij,ekj->eik", B, B) + 0.1 * np.eye(12, dtype=np.float32)
        b = rng.randn(16, 12).astype(np.float32)
        x = np.asarray(spd_solve(jnp.asarray(A), jnp.asarray(b)))
        expect = np.stack([np.linalg.solve(A[i], b[i]) for i in range(16)])
        np.testing.assert_allclose(x, expect, rtol=2e-3, atol=1e-4)

    def test_inv3(self):
        from partmanip_tpu.ops.linalg import inv3
        rng = np.random.RandomState(1)
        A = rng.randn(8, 3, 3).astype(np.float32)
        A = A @ np.transpose(A, (0, 2, 1)) + 0.5 * np.eye(3, dtype=np.float32)
        inv = np.asarray(inv3(jnp.asarray(A)))
        np.testing.assert_allclose(
            np.einsum("eij,ejk->eik", A, inv),
            np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-4)
