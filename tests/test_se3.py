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


def test_log_small_angle_f32_safe():
    """f32 regression for the production NaN: log() of a near-identity
    delta whose rotation carries accumulated f32 non-orthogonality
    (trace marginally > 3).  The old theta2 < 1e-8 series threshold
    sent theta ~ 1e-4 down the closed form, where cos(1e-4) rounds to
    exactly 1.0f and (1-cos)/t^2 = 0 produced inf/NaN (desk bench,
    frames 49/52)."""
    # The exact delta captured from the failing desk run (frame 48->49).
    R = jnp.asarray(
        [
            [1.0000023e00, -8.9664682e-05, 8.1197941e-06],
            [9.1397786e-05, 1.0000063e00, 4.9752998e-05],
            [-8.3599298e-06, -4.9893279e-05, 1.0000036e00],
        ],
        jnp.float32,
    )
    t = jnp.asarray([-4.8048496e-03, -1.7758846e-02, 7.2211027e-05])
    xi = SE3(R, t).log()
    assert np.all(np.isfinite(np.asarray(xi))), np.asarray(xi)
    # v must reproduce t to f32 accuracy (V ~ I at this angle).
    np.testing.assert_allclose(np.asarray(xi[3:]), np.asarray(t), atol=1e-6)


def test_exp_log_roundtrip_small_angles():
    """exp/log roundtrip across the angles where f32 cancellation
    lives: theta from 1e-6 to 1e-1 rad."""
    rng = np.random.default_rng(11)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    for theta in (1e-6, 1e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2, 1e-1):
        v = rng.uniform(-0.05, 0.05, 3)
        xi = jnp.asarray(np.concatenate([theta * axis, v]), jnp.float32)
        T = SE3.exp(xi)
        back = np.asarray(T.log())
        assert np.all(np.isfinite(back))
        np.testing.assert_allclose(back, np.asarray(xi), atol=2e-6)
        # exp must actually rotate: |R - I| ~ theta, not collapsed to I
        # (the old threshold zeroed b=(1-cos)/t^2 below t~3e-4).
        offdiag = np.asarray(T.rotation) - np.eye(3)
        assert np.abs(offdiag).max() > 0.5 * theta
