"""Quaternion / rotation math core.

TPU-native counterpart of the reference's TorchScript kernel library
(``utils/torch_jit_utils.py``) plus the handful of isaacgym ``torch_utils``
helpers the reference imports (``quat_mul``, ``quat_conjugate``,
``quat_rotate`` ...).  Everything here is pure ``jnp`` and broadcasts over
arbitrary leading batch axes, so it vmaps/shards for free.

Conventions
-----------
* Quaternions are ``[x, y, z, w]`` (scalar-last), matching Isaac Gym and the
  reference throughout (e.g. ``utils/torch_jit_utils.py:386`` unbinds
  ``i, j, k, r`` from the last axis).
* Rotation matrices are world-from-body: ``p_world = R @ p_body + t``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def normalize(v: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Normalize along the last axis."""
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def quat_unit(q: jnp.ndarray) -> jnp.ndarray:
    return normalize(q)


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b for xyzw quats (≙ isaacgym ``quat_mul``)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quat(s) q (≙ isaacgym ``quat_rotate``)."""
    q_vec = q[..., :3]
    q_w = q[..., 3:4]
    t = 2.0 * jnp.cross(q_vec, v)
    return v + q_w * t + jnp.cross(q_vec, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conjugate(q), v)


def quat_axis(q: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Rotated basis vector (≙ ``torch_jit_utils.py:64-69``)."""
    basis = jnp.zeros(q.shape[:-1] + (3,))
    basis = basis.at[..., axis].set(1.0)
    return quat_rotate(q, basis)


def quat_from_angle_axis(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """Axis must be unit; angle broadcasts against axis' batch shape."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate(
        [axis * jnp.sin(half), jnp.cos(half)], axis=-1
    )


def quat_from_euler_xyz(roll, pitch, yaw) -> jnp.ndarray:
    """Intrinsic XYZ (roll-pitch-yaw) Euler angles to xyzw quat.

    Matches URDF ``rpy`` semantics: R = Rz(yaw) @ Ry(pitch) @ Rx(roll).
    """
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """xyzw quat → 3x3 rotation matrix (≙ ``torch_jit_utils.py:374-403``).

    Like the reference, robust to non-unit quats via the 2/|q|^2 factor.
    """
    i, j, k, r = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix → xyzw quat. Branch-free (Shepperd's method via
    jnp.where) so it jits cleanly on TPU."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate formulations; pick the numerically best per-element.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw_w = safe_sqrt(1.0 + tr) * 0.5
    q_w = jnp.stack(
        [(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw_w * qw_w], axis=-1
    ) / (4.0 * qw_w[..., None])

    qx_x = safe_sqrt(1.0 + m00 - m11 - m22) * 0.5
    q_x = jnp.stack(
        [4.0 * qx_x * qx_x, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1
    ) / (4.0 * qx_x[..., None])

    qy_y = safe_sqrt(1.0 - m00 + m11 - m22) * 0.5
    q_y = jnp.stack(
        [(m01 + m10), 4.0 * qy_y * qy_y, (m12 + m21), (m02 - m20)], axis=-1
    ) / (4.0 * qy_y[..., None])

    qz_z = safe_sqrt(1.0 - m00 - m11 + m22) * 0.5
    q_z = jnp.stack(
        [(m02 + m20), (m12 + m21), 4.0 * qz_z * qz_z, (m10 - m01)], axis=-1
    ) / (4.0 * qz_z[..., None])

    # Choose the branch with the largest pivot.
    cand = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # [..., 4, 4]
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
         1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    return quat_unit(q)


def orientation_error(desired: jnp.ndarray, current: jnp.ndarray) -> jnp.ndarray:
    """Small-angle orientation error (≙ ``torch_jit_utils.py:71-75``)."""
    q_r = quat_mul(desired, quat_conjugate(current))
    return q_r[..., 0:3] * jnp.sign(q_r[..., 3:4])


def quat_diff_rad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle between two quats in radians (≙ ``torch_jit_utils.py:144-163``)."""
    mul = quat_mul(a, quat_conjugate(b))
    return 2.0 * jnp.arcsin(
        jnp.clip(jnp.linalg.norm(mul[..., 0:3], axis=-1), max=1.0)
    )


def mat_diff_rad(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between rotation matrices (≙ ``torch_jit_utils.py:405-409``)."""
    diff = jnp.matmul(jnp.swapaxes(m1, -1, -2), m2)
    tr = diff[..., 0, 0] + diff[..., 1, 1] + diff[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))


def scale_transform(x, lower, upper):
    """Normalize x from [lower, upper] to [-1, 1] (≙ ``torch_jit_utils.py:82-100``)."""
    offset = (lower + upper) * 0.5
    return 2.0 * (x - offset) / (upper - lower)


def unscale_transform(x, lower, upper):
    offset = (lower + upper) * 0.5
    return x * (upper - lower) * 0.5 + offset


def _octahedral_group() -> np.ndarray:
    """The 24 rotation matrices of the cube's proper symmetry group."""
    mats = []
    for perm in [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]:
        for sx in (1, -1):
            for sy in (1, -1):
                for sz in (1, -1):
                    m = np.zeros((3, 3))
                    m[0, perm[0]] = sx
                    m[1, perm[1]] = sy
                    m[2, perm[2]] = sz
                    if np.linalg.det(m) > 0.5:
                        mats.append(m)
    out = np.stack(mats, axis=0)
    assert out.shape == (24, 3, 3)
    return out


_OCTA = _octahedral_group()


def deambiguity_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Snap a cube orientation to its symmetry-canonical frame.

    Given quat(s) ``q`` of a (symmetric) cube, returns among the 24
    symmetry-equivalent rotation matrices ``R @ S`` (S in the rotational
    octahedral group) the one closest to the identity.  Equivalent to the
    reference's column-pair enumeration (``torch_jit_utils.py:411-425``):
    both candidate sets are exactly {R·S : S ∈ octahedral group}.

    Args:
        q: [..., 4] xyzw quats.
    Returns:
        [..., 3, 3] canonical rotation matrices.
    """
    r = quat_to_mat(q)  # [..., 3, 3]
    sym = jnp.asarray(_OCTA, dtype=r.dtype)  # [24, 3, 3]
    cand = jnp.einsum("...ij,kjl->...kil", r, sym)  # [..., 24, 3, 3]
    tr = cand[..., 0, 0] + cand[..., 1, 1] + cand[..., 2, 2]
    # closest-to-identity == max trace; avoids the acos of the reference.
    best = jnp.argmax(tr, axis=-1)
    return jnp.take_along_axis(
        cand, best[..., None, None, None].repeat(3, -2).repeat(3, -1), axis=-3
    )[..., 0, :, :]


def transform_apply(pos: jnp.ndarray, quat: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid transform (pos, quat) to point(s) p."""
    return quat_rotate(quat, p) + pos


def transform_compose(pos_a, quat_a, pos_b, quat_b):
    """Compose transforms: result = A ∘ B (apply B first, then A)."""
    return quat_rotate(quat_a, pos_b) + pos_a, quat_mul(quat_a, quat_b)


def transform_inverse(pos, quat):
    qi = quat_conjugate(quat)
    return -quat_rotate(qi, pos), qi


def quat_to_angle_axis(q: jnp.ndarray):
    """xyzw quat → (angle, axis), angle normalized to [-π, π]
    (≙ ``torch_jit_utils.py:213-234``)."""
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    angle = normalize_angle(2.0 * jnp.arccos(w))
    small = sin_theta <= 1e-5
    axis = q[..., 0:3] / jnp.where(small, 1.0, sin_theta)[..., None]
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    angle = jnp.where(small, 0.0, angle)
    axis = jnp.where(small[..., None], default_axis, axis)
    return angle, axis


def normalize_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Wrap to [-π, π]."""
    return jnp.mod(a + jnp.pi, 2 * jnp.pi) - jnp.pi


def angle_axis_to_exp_map(angle, axis):
    return angle[..., None] * axis


def quat_to_exp_map(q):
    """(≙ ``torch_jit_utils.py:244-251``)."""
    angle, axis = quat_to_angle_axis(q)
    return angle_axis_to_exp_map(angle, axis)


def exp_map_to_angle_axis(exp_map):
    angle = jnp.linalg.norm(exp_map, axis=-1)
    small = angle <= 1e-5
    axis = exp_map / jnp.where(small, 1.0, angle)[..., None]
    default_axis = jnp.zeros_like(exp_map).at[..., 2].set(1.0)
    return (jnp.where(small, 0.0, normalize_angle(angle)),
            jnp.where(small[..., None], default_axis, axis))


def exp_map_to_quat(exp_map):
    angle, axis = exp_map_to_angle_axis(exp_map)
    return quat_from_angle_axis(angle, axis)


def quat_to_tan_norm(q):
    """Rotation as (tangent, normal) 6D (≙ ``torch_jit_utils.py:253-266``)."""
    tan = quat_axis(q, 0)
    norm_ = quat_axis(q, 2)
    return jnp.concatenate([tan, norm_], axis=-1)


def slerp(q0, q1, t):
    """Spherical interpolation, shortest arc (≙ ``torch_jit_utils.py:300-333``)."""
    cos_half = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(cos_half < 0, -q1, q1)
    cos_half = jnp.abs(cos_half)
    cos_half = jnp.clip(cos_half, 0.0, 1.0)
    half = jnp.arccos(cos_half)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))
    safe_sin = jnp.where(jnp.abs(sin_half) < 1e-3, 1.0, sin_half)
    ra = jnp.sin((1 - t) * half) / safe_sin
    rb = jnp.sin(t * half) / safe_sin
    out = ra * q0 + rb * q1
    lin = (1 - t) * q0 + t * q1  # near-parallel fallback
    out = jnp.where(jnp.abs(sin_half) < 1e-3, lin, out)
    return jnp.where(cos_half >= 1.0, q0, out)


def calc_heading(q):
    """xy-plane heading angle (≙ ``torch_jit_utils.py:335-346``)."""
    rot_dir = quat_axis(q, 0)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def calc_heading_quat(q):
    heading = calc_heading(q)
    axis = jnp.zeros(q.shape[:-1] + (3,)).at[..., 2].set(1.0)
    return quat_from_angle_axis(heading, axis)


def calc_heading_quat_inv(q):
    heading = calc_heading(q)
    axis = jnp.zeros(q.shape[:-1] + (3,)).at[..., 2].set(1.0)
    return quat_from_angle_axis(-heading, axis)


def local_to_world_space(pos_offset_local, pose_global):
    """Local-frame point → world (≙ ``torch_jit_utils.py:166-185``).
    pose_global: [..., 7] (pos + xyzw quat)."""
    return quat_rotate(pose_global[..., 3:7], pos_offset_local) \
        + pose_global[..., 0:3]
