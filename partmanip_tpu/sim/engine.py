"""Scene-level physics step: the TPU-native ``gym.simulate``.

Composes the articulated robot, an optional articulated object (cabinet) and
an optional free body (cube) with SDF penalty contacts into one fused,
jittable step (≙ the ``gym.simulate``/``fetch_results`` loop at
``tasks/hand_base.py:282-284``).  All coupling forces are evaluated at the
start of each inner substep (simultaneous explicit coupling); the robot's
solve carries implicit contact damping/stiffness rows so the high-gain PD
drives stay stable at the PhysX-like timestep (dt=1/60, 4 substeps,
``cfg/base_cfg.yaml:31``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rotations as rot
from . import contact, dynamics, kinematics
from .types import (BoxGeoms, FreeBodySpec, FreeBodyState, SimParams,
                    SphereGeoms, TreeSpec, TreeState)


class SceneSpec(NamedTuple):
    robot: TreeSpec
    spheres: SphereGeoms
    params: SimParams
    obj_tree: Optional[TreeSpec] = None
    obj_boxes: Optional[BoxGeoms] = None
    free_body: Optional[FreeBodySpec] = None


class SceneState(NamedTuple):
    robot: TreeState
    obj: Optional[TreeState] = None
    body: Optional[FreeBodyState] = None


def obj_box_world(spec: TreeSpec, boxes: BoxGeoms, fk, E: int):
    """World poses of object collision boxes [E, G, ...]."""
    G = boxes.link_idx.shape[-1]
    li = jnp.broadcast_to(boxes.link_idx, (E, G))
    lp = kinematics._take_env(fk.link_pos, li)
    lq = kinematics._take_env(fk.link_quat, li)
    bp, bq = rot.transform_compose(
        lp, lq,
        jnp.broadcast_to(boxes.offset_pos, (E, G, 3)),
        jnp.broadcast_to(boxes.offset_quat, (E, G, 4)),
    )
    return bp, bq


def _inner_step(scene: SceneSpec, state: SceneState, pos_targets, h,
                gravity, coriolis=True) -> SceneState:
    E = state.robot.qpos.shape[0]
    p = scene.params
    rspec = scene.robot
    fk_r = kinematics.forward_kinematics(rspec, state.robot)
    M_r = dynamics.mass_matrix(rspec, fk_r, E)

    # robot collision spheres: world positions, point Jacobians, velocities
    S = scene.spheres.link_idx.shape[0]
    centers = contact.sphere_positions(rspec, fk_r, scene.spheres, E)
    sphere_link = jnp.broadcast_to(scene.spheres.link_idx[None], (E, S))
    Jp_s = kinematics.point_jacobian(rspec, fk_r, sphere_link, centers)
    v_s = jnp.einsum("esad,ed->esa", Jp_s, state.robot.qvel)
    radii = jnp.asarray(scene.spheres.radius)
    mu_s = jnp.asarray(scene.spheres.friction)

    contact_sets = []   # (ContactSet, v_self, m_eff)
    # 1) robot vs ground — m_eff ≈ effective mass of the colliding links
    cs_g = contact.spheres_vs_ground(centers, radii, mu_s)
    contact_sets.append((cs_g, v_s, 0.5))

    # 2) robot vs free body (cube)
    fb_force = None
    if scene.free_body is not None:
        fb = scene.free_body
        half = jnp.broadcast_to(fb.half_extents, (E, 3))[:, None, :]
        cs_b, _ = contact.spheres_vs_boxes(
            centers, radii, mu_s,
            state.body.pos[:, None, :], state.body.quat[:, None, :],
            half, jnp.ones((E, 1)), jnp.broadcast_to(fb.friction, (E,))[:, None],
            lambda pts: contact.free_body_point_velocity(
                state.body, pts.reshape(E, -1, 3)).reshape(pts.shape),
        )
        vs_b = v_s[:, :, None, :].repeat(1, axis=2).reshape(E, -1, 3)
        # reduced mass of a finger-vs-cube pair ≈ the cube's mass
        m_cube = float(np.asarray(fb.mass).reshape(-1)[0])
        contact_sets.append((cs_b, vs_b, m_cube))

    # 3) robot vs articulated object boxes
    fk_o = None
    obj_tau = None
    if scene.obj_tree is not None:
        ospec = scene.obj_tree
        fk_o = kinematics.forward_kinematics(ospec, state.obj)
        bp, bq = obj_box_world(ospec, scene.obj_boxes, fk_o, E)
        G = bp.shape[1]
        box_link = jnp.broadcast_to(scene.obj_boxes.link_idx, (E, G))

        def v_box_fn(pts):
            flat = pts.reshape(E, S * G, 3)
            li = jnp.broadcast_to(box_link[:, None, :], (E, S, G)).reshape(E, S * G)
            Jp_o = kinematics.point_jacobian(ospec, fk_o, li, flat)
            return jnp.einsum("ecad,ed->eca", Jp_o, state.obj.qvel).reshape(pts.shape)

        cs_o, box_idx = contact.spheres_vs_boxes(
            centers, radii, mu_s, bp, bq,
            jnp.broadcast_to(scene.obj_boxes.half_extents, (E, G, 3)),
            jnp.broadcast_to(scene.obj_boxes.geom_mask, (E, G)),
            jnp.broadcast_to(scene.obj_boxes.friction, (E, G)),
            v_box_fn,
        )
        vs_o = jnp.broadcast_to(v_s[:, :, None, :], (E, S, G, 3)).reshape(E, -1, 3)
        # finger/hand vs cabinet: finger-side effective mass dominates
        contact_sets.append((cs_o, vs_o, 0.3))

    # --- forces + robot torque accumulation + implicit rows ---
    tau_r = jnp.zeros_like(state.robot.qpos)
    imp_J, imp_d, imp_k = [], [], []
    forces_per_set = []
    for cs, v_self, m_eff in contact_sets:
        force, fn, touching = contact.penalty_forces(cs, v_self, p, m_eff)
        forces_per_set.append((cs, force, touching))
        Jp_c = jnp.take_along_axis(
            Jp_s, cs.sphere_idx[:, :, None, None].repeat(3, 2).repeat(
                Jp_s.shape[-1], 3), axis=1,
        )  # [E, C, 3, D]
        tau_r = tau_r + jnp.einsum("ecad,eca->ed", Jp_c, force)
        Jn = jnp.einsum("ecad,eca->ecd", Jp_c, cs.normal)
        cd = 2.0 * p.contact_damping_ratio * jnp.sqrt(p.contact_kn * m_eff)
        imp_J.append(Jn)
        imp_d.append(touching * cd)
        imp_k.append(touching * p.contact_kn)

    implicit = dynamics.ImplicitBlocks(
        J=jnp.concatenate(imp_J, axis=1),
        damping=jnp.concatenate(imp_d, axis=1),
        stiffness=jnp.concatenate(imp_k, axis=1),
    )

    robot_new = dynamics.step_tree(
        rspec, state.robot, fk_r, M_r, pos_targets, tau_r, h, gravity,
        implicit=implicit, coriolis=coriolis,
    )

    # --- object-side reactions ---
    body_new = state.body
    if scene.free_body is not None:
        cs_b, force_b, _ = forces_per_set[1]
        # reaction on the cube: −F at the contact points
        f_cube = -jnp.sum(force_b, axis=1)
        torque_cube = -jnp.sum(
            jnp.cross(cs_b.point - state.body.pos[:, None, :], force_b), axis=1
        )
        # cube corners vs ground
        corners_l = contact.box_corners(scene.free_body.half_extents, E)
        corners_w = state.body.pos[:, None, :] + rot.quat_rotate(
            state.body.quat[:, None, :], corners_l
        )
        v_c = contact.free_body_point_velocity(state.body, corners_w)
        depth_c = corners_w[..., 2]
        n_c = jnp.zeros_like(corners_w).at[..., 2].set(1.0)
        cs_c = contact.ContactSet(
            point=corners_w, normal=n_c, depth=depth_c,
            active=jnp.ones((E, 8)),
            sphere_idx=jnp.zeros((E, 8), jnp.int32),
            friction=jnp.broadcast_to(
                0.5 * (scene.free_body.friction + 0.1), (E,))[:, None].repeat(8, 1),
            v_other=jnp.zeros_like(corners_w),
        )
        force_c, _, _ = contact.penalty_forces(
            cs_c, v_c, p, float(scene.free_body.mass.reshape(-1)[0]) / 4.0
        )
        f_cube = f_cube + jnp.sum(force_c, axis=1)
        torque_cube = torque_cube + jnp.sum(
            jnp.cross(corners_w - state.body.pos[:, None, :], force_c), axis=1
        )
        body_new = contact.integrate_free_body(
            scene.free_body, state.body, f_cube, torque_cube, h, gravity
        )

    obj_new = state.obj
    if scene.obj_tree is not None:
        ospec = scene.obj_tree
        cs_o, force_o, touch_o = forces_per_set[-1]
        G = scene.obj_boxes.link_idx.shape[-1]
        li = jnp.broadcast_to(
            jnp.broadcast_to(scene.obj_boxes.link_idx, (E, G))[:, None, :],
            (E, S, G),
        ).reshape(E, S * G)
        Jp_o = kinematics.point_jacobian(ospec, fk_o, li, cs_o.point)
        tau_o = jnp.einsum("ecad,eca->ed", Jp_o, -force_o)
        Jn_o = jnp.einsum("ecad,eca->ecd", Jp_o, cs_o.normal)
        cd = 2.0 * p.contact_damping_ratio * jnp.sqrt(p.contact_kn * 0.3)
        implicit_o = dynamics.ImplicitBlocks(
            J=Jn_o, damping=touch_o * cd, stiffness=touch_o * p.contact_kn
        )
        M_o = dynamics.mass_matrix(ospec, fk_o, E)
        obj_new = dynamics.step_tree(
            ospec, state.obj, fk_o, M_o, state.obj.qpos, tau_o, h, gravity,
            implicit=implicit_o, coriolis=coriolis,
        )

    return SceneState(robot=robot_new, obj=obj_new, body=body_new)


def physics_step(scene: SceneSpec, state: SceneState, pos_targets,
                 coriolis: bool = True) -> SceneState:
    """Advance one control step: substeps × inner_substeps inner steps with
    constant PD targets (≙ ``gym.set_dof_position_target_tensor`` +
    ``control_freq_inv`` loop in ``hand_base.py:282-284``)."""
    p = scene.params
    n = p.substeps * p.inner_substeps
    h = p.dt / n
    gravity = jnp.array([0.0, 0.0, p.gravity])

    def body(carry, _):
        return _inner_step(scene, carry, pos_targets, h, gravity, coriolis), None

    state, _ = jax.lax.scan(body, state, None, length=n)
    return state


def rigid_body_state(spec: TreeSpec, fk, state: TreeState, link_idx):
    """Isaac-style 13-dim rigid body state rows [pos, quat, linvel, angvel]
    for the requested links (≙ ``rigid_body_tensor``,
    ``tasks/grasp_cube.py:33``).

    link_idx: i32 [E, P]
    """
    E = state.qpos.shape[0]
    J = kinematics.frame_jacobian(spec, fk, link_idx)  # [E, P, 6, D]
    vel = jnp.einsum("epad,ed->epa", J, state.qvel)    # [E, P, 6]
    pos = kinematics._take_env(fk.link_pos, link_idx)
    quat = kinematics._take_env(fk.link_quat, link_idx)
    return jnp.concatenate([pos, quat, vel[..., :3], vel[..., 3:]], axis=-1)
