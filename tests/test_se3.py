"""SE(3)/SO(3) Lie-group ops: round trips, identities, batched shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from cvsteer_tpu.slam import se3


def test_exp_log_roundtrip():
    local = np.random.default_rng(7)
    w = local.normal(0, 1.0, (64, 3))
    # log returns the principal angle in [0, pi]: keep |w| < pi for the
    # vector roundtrip (the R-roundtrip below covers larger angles)
    n = np.linalg.norm(w, axis=-1, keepdims=True)
    w = jnp.asarray(w / n * (n % (0.99 * np.pi)), jnp.float32)
    R = se3.exp_so3(w)
    # valid rotations
    eye = np.eye(3)
    RtR = np.asarray(jnp.swapaxes(R, -1, -2) @ R)
    np.testing.assert_allclose(RtR, np.broadcast_to(eye, RtR.shape), atol=1e-5)
    w2 = se3.log_so3(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_log_exp_R_roundtrip_any_angle():
    """exp(log(R)) == R even when the generating angle exceeds pi."""
    local = np.random.default_rng(8)
    w = jnp.asarray(local.normal(0, 2.0, (64, 3)), jnp.float32)
    R = se3.exp_so3(w)
    R2 = se3.exp_so3(se3.log_so3(R))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=2e-3)


def test_exp_small_angle(rng):
    w = jnp.asarray(rng.normal(0, 1e-6, (8, 3)), jnp.float32)
    R = se3.exp_so3(w)
    np.testing.assert_allclose(
        np.asarray(R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
    )
    assert np.isfinite(np.asarray(se3.log_so3(R))).all()


def test_exp_se3_matches_translation_only(rng):
    v = jnp.asarray(rng.normal(0, 1, (4, 3)), jnp.float32)
    xi = jnp.concatenate([jnp.zeros((4, 3)), v], -1)
    R, t = se3.exp_se3(xi)
    np.testing.assert_allclose(np.asarray(t), np.asarray(v), atol=1e-6)


def test_compose_invert(rng):
    wa = jnp.asarray(rng.normal(0, 0.5, (3,)), jnp.float32)
    Ra = se3.exp_so3(wa)
    ta = jnp.asarray(rng.normal(0, 1, (3,)), jnp.float32)
    Ri, ti = se3.invert(Ra, ta)
    Rc, tc = se3.compose(Ra, ta, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-6)


def test_transform_points(rng):
    R = se3.exp_so3(jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float32))
    X = jnp.asarray([[1.0, 0.0, 0.0]])
    Y = se3.transform(R, jnp.zeros(3), X)
    np.testing.assert_allclose(np.asarray(Y), [[0.0, 1.0, 0.0]], atol=1e-6)


def test_rotation_geodesic():
    Ra = se3.exp_so3(jnp.asarray([0.3, 0.0, 0.0], jnp.float32))
    Rb = se3.exp_so3(jnp.asarray([-0.2, 0.0, 0.0], jnp.float32))
    assert abs(float(se3.rotation_geodesic(Ra, Rb)) - 0.5) < 1e-5
