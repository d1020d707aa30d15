"""Pose calculus: quaternion <-> SO(3), camera-tensor packing, pose warm-starts.

TPU-native equivalent of the reference's pose utilities
(reference: include/torchlib/utils.h:174-231 — quad2rotation,
get_camera_from_tensor, get_tensor_from_camera). Unlike the reference, the
rotation is actually encoded when converting a pose matrix to a tensor (the
reference builds the quaternion from an identity matrix — SURVEY.md §2.9.5);
everything here is differentiable jnp so pose optimization backprops through
quat -> R.

Camera tensor layout: ``[qw, qx, qy, qz, tx, ty, tz]`` (quaternion first, as
in the reference's ``Tquad=false`` path).
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotation(quad: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalized quaternion(s) ``[..., 4]`` (w,x,y,z) -> rotation ``[..., 3, 3]``.

    Matches the Shepperd-style expansion in the reference
    (include/torchlib/utils.h:174-195): ``two_s = 2 / <q,q>`` makes the map
    scale-invariant, so the optimizer may drift off the unit sphere freely.
    """
    qr, qi, qj, qk = quad[..., 0], quad[..., 1], quad[..., 2], quad[..., 3]
    two_s = 2.0 / jnp.sum(quad * quad, axis=-1)
    r00 = 1 - two_s * (qj**2 + qk**2)
    r01 = two_s * (qi * qj - qk * qr)
    r02 = two_s * (qi * qk + qj * qr)
    r10 = two_s * (qi * qj + qk * qr)
    r11 = 1 - two_s * (qi**2 + qk**2)
    r12 = two_s * (qj * qk - qi * qr)
    r20 = two_s * (qi * qk - qj * qr)
    r21 = two_s * (qj * qk + qi * qr)
    r22 = 1 - two_s * (qi**2 + qj**2)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotation_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``[..., 3, 3]`` -> unit quaternion ``[..., 4]`` (w,x,y,z).

    Branch-free (lax.select over the four Shepperd cases) so it jits with
    static shapes and batches. Fixes reference defect SURVEY.md §2.9.5 where
    the quaternion was computed from an identity matrix.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically safest by largest
    # pivot. Each candidate: q = [w, x, y, z] * (0.25 / s-ish scale).
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack(
        [0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0],
        axis=-1,
    )
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack(
        [(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1],
        axis=-1,
    )
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack(
        [(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2],
        axis=-1,
    )
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack(
        [(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3],
        axis=-1,
    )

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign (w >= 0) so round-trips are unique. A strict < test
    # (not sign()-multiplication) keeps w == -0.0 — a 180-degree rotation —
    # on the +w branch deterministically: both signs encode the same
    # rotation, but constant_speed_warm_start reads q[0] as cos(theta/2),
    # and a negated quaternion there reads as theta ~= 2*pi and defeats the
    # max_angle clamp.
    return jnp.where(q[..., :1] < 0.0, -q, q)


def camera_from_tensor(cam: jnp.ndarray) -> jnp.ndarray:
    """Camera tensor ``[..., 7]`` (qw qx qy qz tx ty tz) -> c2w ``[..., 3, 4]``.

    Reference: include/torchlib/utils.h:198-210 (get_camera_from_tensor).
    """
    quad, t = cam[..., :4], cam[..., 4:]
    R = quat_to_rotation(quad)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def tensor_from_camera(c2w: jnp.ndarray) -> jnp.ndarray:
    """c2w ``[..., 3|4, 4]`` -> camera tensor ``[..., 7]``.

    Reference: include/torchlib/utils.h:212-231 (get_tensor_from_camera),
    with the rotation actually encoded (§2.9.5 fix).
    """
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    return jnp.concatenate([rotation_to_quat(R), t], axis=-1)


def to_homogeneous(c2w34: jnp.ndarray) -> jnp.ndarray:
    """``[..., 3, 4]`` -> ``[..., 4, 4]`` with the affine bottom row."""
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=c2w34.dtype),
        c2w34.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([c2w34, bottom], axis=-2)


def invert_pose(c2w: jnp.ndarray) -> jnp.ndarray:
    """Rigid-transform inverse of ``[..., 4, 4]`` (w2c from c2w and back)."""
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    inv34 = jnp.concatenate([Rt, t_inv[..., None]], axis=-1)
    return to_homogeneous(inv34)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential map: twist ``[6]`` (omega, v) -> ``[4, 4]`` transform.

    Rodrigues with Taylor fallbacks near theta=0 (branch-free ``where`` so it
    jits and differentiates cleanly at the identity — the Gauss-Newton
    tracker linearizes exactly there). No reference equivalent (the
    reference optimizes a global quaternion+translation tensor with Adam);
    the local twist parametrization keeps the tracker's normal equations
    well-conditioned around the warm start.
    """
    w, v = xi[:3], xi[3:]
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(jnp.maximum(th2, 1e-24))
    small = th2 < 1e-12
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (1.0 - A) / th2)
    K = jnp.array(
        [
            [0.0, -w[2], w[1]],
            [w[2], 0.0, -w[0]],
            [-w[1], w[0], 0.0],
        ]
    )
    K2 = K @ K
    I = jnp.eye(3, dtype=xi.dtype)
    R = I + A * K + B * K2
    V = I + B * K + C * K2
    top = jnp.concatenate([R, (V @ v)[:, None]], axis=-1)
    return to_homogeneous(top)


def constant_speed_warm_start(
    prev: jnp.ndarray,
    prev2: jnp.ndarray,
    max_t: float = 0.15,
    max_angle: float = 0.3,
) -> jnp.ndarray:
    """Constant-velocity motion model: extrapolate the next c2w from the last two.

    The intent behind the reference's `const_speed_assumption: True`
    (config/nice_slam.yaml:37) that src/Tracker.cpp:99-100 left as "TO DO"
    (SURVEY.md §2.9.10): ``next = prev @ inv(prev2) @ prev``.

    The extrapolated delta is clamped to a physical per-frame motion bound
    (``max_t`` meters, ``max_angle`` radians): if one frame's estimate is
    off by e, naive extrapolation starts the next frame 2e off — an
    unstable doubling that can run the estimate to infinity in a dozen
    frames. Clamping bounds the warm-start error at the motion scale the
    tracker's basin of attraction actually covers.
    """
    delta = prev @ invert_pose(prev2)
    R, t = delta[:3, :3], delta[:3, 3]
    tn = jnp.linalg.norm(t)
    t = t * jnp.minimum(1.0, max_t / (tn + 1e-12))
    q = rotation_to_quat(R)
    half = jnp.arccos(jnp.clip(q[0], -1.0, 1.0))  # theta/2
    axis = q[1:] / jnp.maximum(jnp.linalg.norm(q[1:]), 1e-12)
    half_c = jnp.minimum(half, max_angle / 2.0)
    q_c = jnp.concatenate([jnp.cos(half_c)[None], jnp.sin(half_c) * axis])
    Rc = quat_to_rotation(q_c)
    delta_c = to_homogeneous(
        jnp.concatenate([Rc, t[:, None]], axis=-1)
    )
    return delta_c @ prev
