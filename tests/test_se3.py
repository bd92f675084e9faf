import jax.numpy as jnp
import numpy as np

from vulcan_tpu.core.se3 import SE3, so3_exp, so3_log


def random_se3(rng, scale_rot=1.0, scale_t=1.0):
    xi = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-scale_rot, scale_rot, 3),
                rng.uniform(-scale_t, scale_t, 3),
            ]
        ),
        jnp.float32,
    )
    return SE3.exp(xi)


def test_identity_apply():
    T = SE3.identity()
    p = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(T.apply(p), p)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        w = jnp.asarray(rng.uniform(-1.5, 1.5, 3), jnp.float32)
        R = so3_exp(w)
        # Orthonormality
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
        np.testing.assert_allclose(so3_log(R), w, atol=1e-4)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        xi = jnp.asarray(rng.uniform(-1.0, 1.0, 6), jnp.float32)
        T = SE3.exp(xi)
        np.testing.assert_allclose(T.log(), xi, atol=1e-4)


def test_small_angle_stability():
    for eps in (0.0, 1e-10, 1e-6):
        xi = jnp.asarray([eps, 0, 0, 0.1, 0.2, 0.3], jnp.float32)
        T = SE3.exp(xi)
        assert np.all(np.isfinite(np.asarray(T.rotation)))
        np.testing.assert_allclose(T.translation, [0.1, 0.2, 0.3], atol=1e-5)


def test_compose_inverse():
    rng = np.random.default_rng(2)
    A, B = random_se3(rng), random_se3(rng)
    p = jnp.asarray(rng.uniform(-1, 1, (5, 3)), jnp.float32)
    np.testing.assert_allclose(
        (A @ B).apply(p), A.apply(B.apply(p)), atol=1e-5
    )
    np.testing.assert_allclose(A.inverse().apply(A.apply(p)), p, atol=1e-5)
    M = A.as_matrix()
    np.testing.assert_allclose(
        SE3.from_matrix(M).apply(p), A.apply(p), atol=1e-6
    )


def test_exp_matches_matrix_exponential():
    from scipy.linalg import expm

    rng = np.random.default_rng(3)
    w = rng.uniform(-1, 1, 3)
    v = rng.uniform(-1, 1, 3)
    xi_mat = np.zeros((4, 4))
    xi_mat[:3, :3] = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
    )
    xi_mat[:3, 3] = v
    expected = expm(xi_mat)
    T = SE3.exp(jnp.asarray(np.concatenate([w, v]), jnp.float32))
    np.testing.assert_allclose(T.as_matrix(), expected, atol=1e-5)
