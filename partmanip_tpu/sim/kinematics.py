"""Batched forward kinematics and Jacobians for padded articulations.

Replaces Isaac Gym's ``refresh_rigid_body_state_tensor`` /
``acquire_jacobian_tensor`` (``tasks/hand_base.py:404-411``,
``tasks/load_robot.py:93-94``): link poses and analytic world-frame Jacobians
computed as pure functions of ``(spec, state)``, batched over envs.

The link sweep is a Python loop over L (≤16) — unrolled at trace time into a
static chain of batched gathers/quaternion ops, which XLA fuses; the env axis
is the vectorized/sharded dimension.  Joint types are blended branchlessly so
per-env heterogeneous topologies (padded GAPartNet objects) compile to one
program.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import rotations as rot
from .types import FK, TreeSpec, TreeState


def _take_env(arr, idx):
    """Gather along the link axis with per-env indices.

    arr: [Eb, L, ...] (Eb in {1, E}), idx: [Eb2, ...] env-batched indices.
    """
    return jnp.take_along_axis(
        arr, idx.reshape(idx.shape + (1,) * (arr.ndim - idx.ndim)), axis=1
    )


def forward_kinematics(spec: TreeSpec, state: TreeState) -> FK:
    """Compute world link poses and per-dof world axes/anchors.

    qpos entries are gathered per link via ``spec.dof_idx``; fixed links use a
    zero joint coordinate (branchless blend on ``joint_type``).
    """
    E = state.qpos.shape[0]
    L = spec.num_links
    D = spec.num_dofs

    # q value per link (0 for fixed links).
    qlink = jnp.take_along_axis(
        jnp.broadcast_to(state.qpos, (E, D)),
        jnp.broadcast_to(spec.dof_idx, (E, L)), axis=1,
    )  # [E, L]
    is_rev = (spec.joint_type == 1).astype(state.qpos.dtype)
    is_pris = (spec.joint_type == 2).astype(state.qpos.dtype)
    is_rev = jnp.broadcast_to(is_rev, (E, L))
    is_pris = jnp.broadcast_to(is_pris, (E, L))

    axis = jnp.broadcast_to(spec.axis, (E, L, 3))
    origin_pos = jnp.broadcast_to(spec.origin_pos, (E, L, 3))
    origin_quat = jnp.broadcast_to(spec.origin_quat, (E, L, 4))
    parent = jnp.broadcast_to(spec.parent, (E, L))

    # Joint motion in the joint frame: rotation about axis (revolute) and/or
    # translation along axis (prismatic); identity when fixed.
    jq = rot.quat_from_angle_axis(qlink * is_rev, axis)        # [E, L, 4]
    jt = axis * (qlink * is_pris)[..., None]                   # [E, L, 3]

    # Root link (index 0): its origin transform is applied relative to the
    # provided root pose (normally identity origin).
    p0, q0 = rot.transform_compose(
        state.root_pos, state.root_quat, origin_pos[:, 0], origin_quat[:, 0]
    )
    # Static topologies (shared parent table) use compile-time parent
    # indices — a plain buffer slice instead of a per-env gather. (A variant
    # threading link poses through Python lists + one final stack was tried:
    # it makes XLA:CPU compile superlinearly on composite graphs.)
    static_parents = None
    if hasattr(spec.parent, "shape") and spec.parent.shape[0] == 1:
        import numpy as _np
        if isinstance(spec.parent, _np.ndarray):
            static_parents = [int(x) for x in spec.parent[0]]

    link_pos = jnp.zeros((E, L, 3), state.qpos.dtype).at[:, 0].set(p0)
    link_quat = (jnp.zeros((E, L, 4), state.qpos.dtype)
                 .at[..., 3].set(1.0).at[:, 0].set(q0))
    for l in range(1, L):
        if static_parents is not None:
            pi = max(static_parents[l], 0)
            pp, pq = link_pos[:, pi], link_quat[:, pi]
        else:
            pidx = jnp.clip(parent[:, l], 0, l - 1)
            pp = _take_env(link_pos, pidx[:, None])[:, 0]
            pq = _take_env(link_quat, pidx[:, None])[:, 0]
        # joint frame in world
        jp, jqw = rot.transform_compose(pp, pq, origin_pos[:, l],
                                        origin_quat[:, l])
        # child link frame = joint frame ∘ (translation, rotation)
        cp = jp + rot.quat_rotate(jqw, jt[:, l])
        cq = rot.quat_mul(jqw, jq[:, l])
        link_pos = link_pos.at[:, l].set(cp)
        link_quat = link_quat.at[:, l].set(cq)

    # Per-dof world axis / anchor, gathered at the dof's child link.  The
    # child frame origin lies on the joint axis for revolute joints, and the
    # axis direction is invariant under the joint's own motion.
    dof_child = jnp.broadcast_to(spec.dof_child, (E, D))
    child_quat = _take_env(link_quat, dof_child)          # [E, D, 4]
    dof_anchor = _take_env(link_pos, dof_child)           # [E, D, 3]
    axis_child = _take_env(axis, dof_child)               # [E, D, 3]
    dof_axis_w = rot.quat_rotate(child_quat, axis_child)

    return FK(link_pos=link_pos, link_quat=link_quat,
              dof_axis_w=dof_axis_w, dof_anchor_w=dof_anchor)


def _dof_kind(spec: TreeSpec, E: int):
    """[E, D] revolute / prismatic indicators, gathered per dof."""
    D = spec.num_dofs
    jt = jnp.broadcast_to(spec.joint_type, (E, spec.num_links))
    child = jnp.broadcast_to(spec.dof_child, (E, D))
    kind = jnp.take_along_axis(jt, child, axis=1)
    dm = jnp.broadcast_to(spec.dof_mask, (E, D))
    rev = (kind == 1).astype(jnp.float32) * dm
    pris = (kind == 2).astype(jnp.float32) * dm
    return rev, pris


def point_jacobian(spec: TreeSpec, fk: FK, link_idx, points_w) -> jnp.ndarray:
    """Linear Jacobian of world point(s) attached to link(s).

    Args:
        link_idx: i32 [E, P] link each point is attached to.
        points_w: f32 [E, P, 3] current world positions of the points.
    Returns:
        Jv: f32 [E, P, 3, D] with d(point)/d(qpos).
    """
    E, P = link_idx.shape
    D = spec.num_dofs
    rev, pris = _dof_kind(spec, E)                      # [E, D]
    anc = jnp.broadcast_to(spec.ancestor, (E, spec.num_links, D))
    anc_p = _take_env(anc, link_idx)                    # [E, P, D]
    r = points_w[:, :, None, :] - fk.dof_anchor_w[:, None, :, :]  # [E,P,D,3]
    axis = fk.dof_axis_w[:, None, :, :]                 # [E, 1, D, 3]
    jv = (jnp.cross(axis, r) * rev[:, None, :, None]
          + axis * pris[:, None, :, None]) * anc_p[..., None]
    return jnp.swapaxes(jv, -1, -2)                     # [E, P, 3, D]


def link_jacobians(spec: TreeSpec, fk: FK):
    """Full spatial Jacobians of every link's COM.

    Returns:
        Jv: [E, L, 3, D] linear Jacobian at the link COM (world frame)
        Jw: [E, L, 3, D] angular Jacobian (world frame)
        com_w: [E, L, 3] world COM positions
    """
    E = fk.link_pos.shape[0]
    L, D = spec.num_links, spec.num_dofs
    rev, pris = _dof_kind(spec, E)
    com_w = fk.link_pos + rot.quat_rotate(
        fk.link_quat, jnp.broadcast_to(spec.com, (E, L, 3))
    )
    anc = jnp.broadcast_to(spec.ancestor, (E, L, D))
    r = com_w[:, :, None, :] - fk.dof_anchor_w[:, None, :, :]   # [E,L,D,3]
    axis = fk.dof_axis_w[:, None, :, :]
    jv = (jnp.cross(axis, r) * rev[:, None, :, None]
          + axis * pris[:, None, :, None]) * anc[..., None]
    jw = axis * (rev[:, None, :, None] * anc[..., None])
    return jnp.swapaxes(jv, -1, -2), jnp.swapaxes(jw, -1, -2), com_w


def frame_jacobian(spec: TreeSpec, fk: FK, link_idx, dof_slice=None):
    """6×D spatial Jacobian [linear; angular] of link frame origins.

    TPU counterpart of Isaac's ``jacobian_tensor`` rows used by the damped
    least-squares IK (``tasks/load_robot.py:142-151``).

    Args:
        link_idx: i32 [E, P]
    Returns:
        J: f32 [E, P, 6, D]
    """
    E, P = link_idx.shape
    D = spec.num_dofs
    rev, pris = _dof_kind(spec, E)
    pts = _take_env(fk.link_pos, link_idx)              # [E, P, 3]
    anc = jnp.broadcast_to(spec.ancestor, (E, spec.num_links, D))
    anc_p = _take_env(anc, link_idx)
    r = pts[:, :, None, :] - fk.dof_anchor_w[:, None, :, :]
    axis = fk.dof_axis_w[:, None, :, :]
    jv = (jnp.cross(axis, r) * rev[:, None, :, None]
          + axis * pris[:, None, :, None]) * anc_p[..., None]
    jw = axis * (rev[:, None, :, None] * anc_p[..., None])
    J = jnp.concatenate(
        [jnp.swapaxes(jv, -1, -2), jnp.swapaxes(jw, -1, -2)], axis=-2
    )
    return J
