"""Scene-level physics step: the TPU-native ``gym.simulate``.

Composes the articulated robot, an optional articulated object (cabinet) and
an optional free body (cube) with SDF penalty contacts into one fused,
jittable step (≙ the ``gym.simulate``/``fetch_results`` loop at
``tasks/hand_base.py:282-284``).

TPU layout strategy: per-contact quantities are kept as *vectors* (forces,
normals, depths — [E, S·G, 3] at most) and are aggregated **per collision
sphere** (robot side) and **per box wrench** (object side) before touching
any Jacobian.  Jacobian tensors therefore never exceed [E, S, 3, D] /
[E, G, 6, D] — without this, per-contact Jacobians ([E, ~350, 3, 12]) get
tile-padded to (8, 128) on the minor dims and the step becomes HBM-bound.
The contact stiffness/damping enters the implicit solve as per-sphere 3×3
normal operators N = Σ_c coef·n n ᵀ with A += Jᵀ N J — algebraically exact.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rotations as rot
from ..ops import sdf as sdf_ops
from . import contact, dynamics, kinematics
from .types import (BoxGeoms, FreeBodySpec, FreeBodyState, GridGeoms,
                    SimParams, SphereGeoms, TreeSpec, TreeState)


class SceneSpec(NamedTuple):
    robot: TreeSpec
    spheres: SphereGeoms
    params: SimParams
    obj_tree: Optional[TreeSpec] = None
    obj_boxes: Optional[BoxGeoms] = None
    free_body: Optional[FreeBodySpec] = None
    # baked mesh-SDF collision geoms on the object tree (real GAPartNet
    # assets; ≙ PhysX SDF-mode mesh collision) + their shared grid stack
    obj_grids: Optional["GridGeoms"] = None
    grid_stack: Optional[object] = None  # ops.sdf.GridStack


class SceneState(NamedTuple):
    robot: TreeState
    obj: Optional[TreeState] = None
    body: Optional[FreeBodyState] = None
    anchors: Optional[contact.AnchorState] = None  # stick-friction state


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


def _nnT(normal, coef):
    """Σ over trailing contact axis of coef·n nᵀ → [..., 3, 3]."""
    return jnp.einsum("...c,...ca,...cb->...ab", coef, normal, normal)


def _inner_step(scene: SceneSpec, state: SceneState, pos_targets, h,
                gravity, coriolis=True) -> SceneState:
    E = state.robot.qpos.shape[0]
    p = scene.params
    rspec = scene.robot
    fk_r = kinematics.forward_kinematics(rspec, state.robot)
    M_r = dynamics.mass_matrix(rspec, fk_r, E)

    # robot collision spheres: world positions, per-sphere Jacobians, vels
    S = scene.spheres.link_idx.shape[0]
    centers = contact.sphere_positions(rspec, fk_r, scene.spheres, E)
    sphere_link = jnp.broadcast_to(scene.spheres.link_idx[None], (E, S))
    Jp_s = kinematics.point_jacobian(rspec, fk_r, sphere_link, centers)
    v_s = jnp.einsum("esad,ed->esa", Jp_s, state.robot.qvel)
    radii = jnp.asarray(scene.spheres.radius)
    mu_s = jnp.asarray(scene.spheres.friction)

    # Accumulators: force per sphere [E, S, 3] and the implicit 3×3 normal
    # operator per sphere (already carrying its h factors).
    F_sphere = jnp.zeros((E, S, 3))
    N_sphere = jnp.zeros((E, S, 3, 3))

    def imp_coef(touching, m_eff):
        cd = 2.0 * p.contact_damping_ratio * jnp.sqrt(p.contact_kn * m_eff)
        return touching * (h * cd + h * h * p.contact_kn)

    # Per-sphere best-partner bookkeeping for the stick-slip anchors:
    # partner ids: 0 ground, 1 cube, 2+g object box g.
    best_depth = jnp.full((E, S), 1e9)
    best = {
        "id": jnp.full((E, S), -1, jnp.int32),
        "normal": jnp.zeros((E, S, 3)),
        "fn": jnp.zeros((E, S)),
        "mu": jnp.zeros((E, S)),
        "touch": jnp.zeros((E, S)),
        "pvel": jnp.zeros((E, S, 3)),
    }

    def consider(depth, pid, normal, fn, mu, touch, pvel):
        nonlocal best_depth, best
        better = (depth < best_depth) & (touch > 0)
        best_depth = jnp.where(better, depth, best_depth)
        best["id"] = jnp.where(better, pid, best["id"])
        best["normal"] = jnp.where(better[..., None], normal, best["normal"])
        best["fn"] = jnp.where(better, fn, best["fn"])
        best["mu"] = jnp.where(better, mu, best["mu"])
        best["touch"] = jnp.maximum(best["touch"], touch * better)
        best["pvel"] = jnp.where(better[..., None], pvel, best["pvel"])

    # 1) robot vs ground
    cs_g = contact.spheres_vs_ground(centers, radii, mu_s)
    f_g, fn_g, t_g = contact.penalty_forces(cs_g, v_s, p, 0.5)
    F_sphere = F_sphere + f_g
    N_sphere = N_sphere + _nnT(cs_g.normal[:, :, None, :],
                               imp_coef(t_g, 0.5)[:, :, None])
    consider(cs_g.depth, jnp.zeros((E, S), jnp.int32), cs_g.normal, fn_g,
             cs_g.friction, t_g, jnp.zeros((E, S, 3)))

    # 2) robot vs free body (cube)
    cube_wrench = None
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
        m_cube = float(np.asarray(fb.mass).reshape(-1)[0])
        f_b, fn_b, t_b = contact.penalty_forces(cs_b, v_s, p, m_cube,
                                                recede_damp=1.0)
        F_sphere = F_sphere + f_b
        N_sphere = N_sphere + _nnT(cs_b.normal[:, :, None, :],
                                   imp_coef(t_b, m_cube)[:, :, None])
        # reaction wrench on the cube about its COM (normal part)
        r = cs_b.point - state.body.pos[:, None, :]
        cube_wrench = (-jnp.sum(f_b, axis=1),
                       -jnp.sum(jnp.cross(r, f_b), axis=1))
        consider(cs_b.depth, jnp.ones((E, S), jnp.int32), cs_b.normal, fn_b,
                 cs_b.friction, t_b,
                 contact.free_body_point_velocity(state.body, centers))

    # 3) robot vs articulated object boxes
    fk_o = None
    obj_reaction = None
    if scene.obj_tree is not None:
        ospec = scene.obj_tree
        fk_o = kinematics.forward_kinematics(ospec, state.obj)
        bp, bq = obj_box_world(ospec, scene.obj_boxes, fk_o, E)
        G = bp.shape[1]
        box_link = jnp.broadcast_to(scene.obj_boxes.link_idx, (E, G))

        # per-box spatial jacobians at link origin → shifted to box center
        J6 = kinematics.frame_jacobian(ospec, fk_o, box_link)  # [E,G,6,Do]
        Jw_box = J6[:, :, 3:, :]
        r_box = bp - kinematics._take_env(fk_o.link_pos, box_link)
        # Jv at box center: Jv_o + Jw × r  (column-wise cross)
        Jv_box = J6[:, :, :3, :] + jnp.cross(
            jnp.swapaxes(Jw_box, -1, -2), r_box[:, :, None, :]
        ).swapaxes(-1, -2)
        qv_o = state.obj.qvel
        v_bc = jnp.einsum("egad,ed->ega", Jv_box, qv_o)   # box center vel
        w_b = jnp.einsum("egad,ed->ega", Jw_box, qv_o)    # box angular vel

        def v_box_fn(pts):  # pts [E, S, G, 3]
            r = pts - bp[:, None, :, :]
            return v_bc[:, None, :, :] + jnp.cross(w_b[:, None, :, :], r)

        cs_o, _ = contact.spheres_vs_boxes(
            centers, radii, mu_s, bp, bq,
            jnp.broadcast_to(scene.obj_boxes.half_extents, (E, G, 3)),
            jnp.broadcast_to(scene.obj_boxes.geom_mask, (E, G)),
            jnp.broadcast_to(scene.obj_boxes.friction, (E, G)),
            v_box_fn,
        )
        vs_o = jnp.broadcast_to(v_s[:, :, None, :], (E, S, G, 3)).reshape(E, -1, 3)
        f_o, fn_o, t_o = contact.penalty_forces(cs_o, vs_o, p, 0.3)
        f_osg = f_o.reshape(E, S, G, 3)
        t_osg = t_o.reshape(E, S, G)
        n_osg = cs_o.normal.reshape(E, S, G, 3)
        # best box per sphere for the anchor bookkeeping
        d_sg = cs_o.depth.reshape(E, S, G)
        masked_d = jnp.where(t_osg > 0, d_sg, 1e9)
        gbest = jnp.argmin(masked_d, axis=-1)                  # [E, S]
        take_g = lambda a: jnp.take_along_axis(
            a, gbest[..., None, None] if a.ndim == 4 else gbest[..., None],
            axis=2)[:, :, 0]
        fn_sg = fn_o.reshape(E, S, G)
        mu_sg = cs_o.friction.reshape(E, S, G)
        pv = v_box_fn(centers[:, :, None, :].repeat(G, 2))     # [E,S,G,3]
        consider(take_g(d_sg), 2 + gbest, take_g(n_osg), take_g(fn_sg),
                 take_g(mu_sg), (take_g(masked_d) < 0).astype(jnp.float32),
                 take_g(pv))
        F_sphere = F_sphere + jnp.sum(f_osg, axis=2)
        N_sphere = N_sphere + _nnT(n_osg, imp_coef(t_osg, 0.3))

        # reaction on the object: per-box wrench about the box center
        pts = cs_o.point.reshape(E, S, G, 3)
        rr = pts - bp[:, None, :, :]
        F_box = -jnp.sum(f_osg, axis=1)                     # [E, G, 3]
        T_box = -jnp.sum(jnp.cross(rr, f_osg), axis=1)      # [E, G, 3]
        tau_o = (jnp.einsum("egad,ega->ed", Jv_box, F_box)
                 + jnp.einsum("egad,ega->ed", Jw_box, T_box))
        N_box = jnp.einsum("esg,esga,esgb->egab",
                           imp_coef(t_osg, 0.3), n_osg, n_osg)
        obj_reaction = (tau_o, Jv_box, N_box)

    # 3b) robot vs baked mesh-SDF geoms on the object tree (real GAPartNet
    # assets; ≙ PhysX SDF-mode collision).  Same penalty/implicit treatment
    # as the boxes; the trilinear gradient supplies the contact normal.
    G = scene.obj_boxes.link_idx.shape[-1] if scene.obj_tree is not None else 0
    KOFF = 2 + G                       # partner ids of grid geoms start here
    gp = gq = None
    if scene.obj_grids is not None:
        gg = scene.obj_grids
        K = gg.link_idx.shape[-1]
        glink = jnp.broadcast_to(gg.link_idx, (E, K))
        gp, gq = rot.transform_compose(
            kinematics._take_env(fk_o.link_pos, glink),
            kinematics._take_env(fk_o.link_quat, glink),
            jnp.broadcast_to(gg.offset_pos, (E, K, 3)),
            jnp.broadcast_to(gg.offset_quat, (E, K, 4)))
        J6g = kinematics.frame_jacobian(scene.obj_tree, fk_o, glink)
        Jw_g = J6g[:, :, 3:, :]
        r_gl = gp - kinematics._take_env(fk_o.link_pos, glink)
        Jv_g = J6g[:, :, :3, :] + jnp.cross(
            jnp.swapaxes(Jw_g, -1, -2), r_gl[:, :, None, :]
        ).swapaxes(-1, -2)
        qv_o = state.obj.qvel
        v_gc = jnp.einsum("ekad,ed->eka", Jv_g, qv_o)
        w_g = jnp.einsum("ekad,ed->eka", Jw_g, qv_o)

        relg = centers[:, :, None, :] - gp[:, None, :, :]       # [E,S,K,3]
        gq_b = jnp.broadcast_to(gq[:, None], (E, S, K, 4))
        p_locg = rot.quat_rotate_inverse(gq_b, relg)
        gid = jnp.broadcast_to(
            jnp.broadcast_to(gg.grid_id, (E, K))[:, None, :], (E, S, K))
        val, grad = sdf_ops.grid_query_grad(scene.grid_stack, gid, p_locg,
                                            outside_value=1.0)
        gnorm = jnp.linalg.norm(grad, axis=-1)
        n_locg = grad / jnp.maximum(gnorm, 1e-9)[..., None]
        n_g2 = rot.quat_rotate(gq_b, n_locg)                    # [E,S,K,3]
        depth_g2 = val - radii[None, :, None]
        v_og = v_gc[:, None] + jnp.cross(w_g[:, None], relg)
        mu_g2 = 0.5 * (mu_s[None, :, None]
                       + jnp.broadcast_to(gg.friction, (E, K))[:, None, :])
        act_g2 = (jnp.broadcast_to(gg.geom_mask, (E, K))[:, None, :]
                  * (gnorm > 1e-6))
        cs_g2 = contact.ContactSet(
            point=centers[:, :, None, :].repeat(K, 2).reshape(E, S * K, 3),
            normal=n_g2.reshape(E, S * K, 3),
            depth=depth_g2.reshape(E, S * K),
            active=act_g2.reshape(E, S * K),
            sphere_idx=jnp.broadcast_to(
                jnp.arange(S)[None, :, None], (E, S, K)).reshape(E, S * K),
            friction=mu_g2.reshape(E, S * K),
            v_other=v_og.reshape(E, S * K, 3),
        )
        vs_g2 = jnp.broadcast_to(
            v_s[:, :, None, :], (E, S, K, 3)).reshape(E, -1, 3)
        f_g2, fn_g2, t_g2 = contact.penalty_forces(cs_g2, vs_g2, p, 0.3)
        f_skc = f_g2.reshape(E, S, K, 3)
        t_skc = t_g2.reshape(E, S, K)
        F_sphere = F_sphere + jnp.sum(f_skc, axis=2)
        N_sphere = N_sphere + _nnT(n_g2, imp_coef(t_skc, 0.3))
        # best grid per sphere for the anchors
        d_sk = depth_g2
        masked_dk = jnp.where(t_skc > 0, d_sk, 1e9)
        kbest = jnp.argmin(masked_dk, axis=-1)
        take_k = lambda a2: jnp.take_along_axis(
            a2, kbest[..., None, None] if a2.ndim == 4 else kbest[..., None],
            axis=2)[:, :, 0]
        consider(take_k(d_sk), KOFF + kbest, take_k(n_g2),
                 take_k(fn_g2.reshape(E, S, K)), take_k(mu_g2),
                 (take_k(masked_dk) < 0).astype(jnp.float32), take_k(v_og))
        # reactions on the object through the grid-link Jacobians
        rrg = (centers[:, :, None, :] - gp[:, None, :, :])
        F_gr = -jnp.sum(f_skc, axis=1)
        T_gr = -jnp.sum(jnp.cross(rrg, f_skc), axis=1)
        tau_gr = (jnp.einsum("ekad,eka->ed", Jv_g, F_gr)
                  + jnp.einsum("ekad,eka->ed", Jw_g, T_gr))
        N_gr = jnp.einsum("esk,eska,eskb->ekab",
                          imp_coef(t_skc, 0.3), n_g2, n_g2)
        if obj_reaction is None:
            obj_reaction = (tau_gr, Jv_g, N_gr)
        else:
            tau_o0, Jv0, N0 = obj_reaction
            obj_reaction = (tau_o0 + tau_gr,
                            jnp.concatenate([Jv0, Jv_g], axis=1),
                            jnp.concatenate([N0, N_gr], axis=1))

    # ---- stick-slip tangential friction via anchors ----
    anchors = state.anchors
    if anchors is None:
        anchors = contact.init_anchors(E, S)

    if scene.obj_tree is not None:
        G = scene.obj_boxes.link_idx.shape[-1]

    def to_world(local, pid):
        out = local  # ground: identity
        if scene.free_body is not None:
            cube_w = rot.quat_rotate(state.body.quat[:, None], local)                 + state.body.pos[:, None]
            out = jnp.where((pid == 1)[..., None], cube_w, out)
        if scene.obj_tree is not None and G > 0:
            g = jnp.clip(pid - 2, 0, G - 1)
            bpg = jnp.take_along_axis(bp, g[..., None], axis=1)
            bqg = jnp.take_along_axis(bq, g[..., None], axis=1)
            box_w = rot.quat_rotate(bqg, local) + bpg
            out = jnp.where(((pid >= 2) & (pid < KOFF))[..., None],
                            box_w, out)
        if gp is not None:
            K = gp.shape[1]
            k = jnp.clip(pid - KOFF, 0, K - 1)
            gpk = jnp.take_along_axis(gp, k[..., None], axis=1)
            gqk = jnp.take_along_axis(gq, k[..., None], axis=1)
            grid_w = rot.quat_rotate(gqk, local) + gpk
            out = jnp.where((pid >= KOFF)[..., None], grid_w, out)
        return out

    def to_local(world, pid):
        out = world
        if scene.free_body is not None:
            cube_l = rot.quat_rotate_inverse(
                state.body.quat[:, None], world - state.body.pos[:, None])
            out = jnp.where((pid == 1)[..., None], cube_l, out)
        if scene.obj_tree is not None and G > 0:
            g = jnp.clip(pid - 2, 0, G - 1)
            bpg = jnp.take_along_axis(bp, g[..., None], axis=1)
            bqg = jnp.take_along_axis(bq, g[..., None], axis=1)
            box_l = rot.quat_rotate_inverse(bqg, world - bpg)
            out = jnp.where(((pid >= 2) & (pid < KOFF))[..., None],
                            box_l, out)
        if gp is not None:
            K = gp.shape[1]
            k = jnp.clip(pid - KOFF, 0, K - 1)
            gpk = jnp.take_along_axis(gp, k[..., None], axis=1)
            gqk = jnp.take_along_axis(gq, k[..., None], axis=1)
            grid_l = rot.quat_rotate_inverse(gqk, world - gpk)
            out = jnp.where((pid >= KOFF)[..., None], grid_l, out)
        return out

    sticky = jnp.broadcast_to(jnp.asarray(scene.spheres.sticky)[None], (E, S))
    ft, new_anchors, stick = contact.anchor_friction(
        centers, v_s, best["normal"], best["fn"], best["mu"],
        best["touch"] * sticky, best["id"], anchors, to_local, to_world,
        best["pvel"], p, 0.1)
    ft = ft * sticky[..., None]
    F_sphere = F_sphere + ft
    # implicit tangential operator (I − n nᵀ) for anchored spheres
    cdt = 2.0 * contact.ANCHOR_ZETA * jnp.sqrt(contact.ANCHOR_KS * 0.1)
    eye = jnp.broadcast_to(jnp.eye(3), (E, S, 3, 3))
    P_t = eye - jnp.einsum("esa,esb->esab", best["normal"], best["normal"])
    N_sphere = N_sphere + (h * cdt + h * h * contact.ANCHOR_KS)         * best["touch"][..., None, None] * P_t

    # friction reactions to partners
    if scene.free_body is not None:
        is_cube = (best["id"] == 1).astype(jnp.float32)[..., None]
        f_c, t_c = cube_wrench
        ftc = ft * is_cube
        # Velocity-matching cap on the cube-side reaction (the sphere side
        # keeps full stiction): the anchor spring's cone limit μ·fn can be
        # tens of N on a 0.125 kg body when the effort-clamped arm presses
        # (watermelon-seed squeeze → ~5 m/s lateral ejection, see
        # scripts/poke_cube.py).  Friction may bring the free body to the
        # finger's tangential speed plus a small holding margin in one inner
        # step — enough to hold a grasped cube against gravity
        # (m·HOLD/h ≈ 6 N ≫ 1.2 N weight) but never to fling it.
        vrel = v_s - best["pvel"]
        vt_c = vrel - jnp.sum(
            vrel * best["normal"], -1, keepdims=True) * best["normal"]
        # per-env mass: FreeBodySpec.mass is [E?]-broadcastable (advisor r4
        # — env-0 scalar silently wrong under per-env mass randomization)
        m_cube = jnp.broadcast_to(scene.free_body.mass, (E,))[:, None]
        n_touch = jnp.maximum(1.0, jnp.sum(
            is_cube[..., 0] * best["touch"], -1, keepdims=True))
        cap = (m_cube / n_touch) * (
            jnp.linalg.norm(vt_c, axis=-1)
            + contact.FREE_BODY_HOLD_VEL) / p.h
        mag = jnp.linalg.norm(ftc, axis=-1)
        ftc = ftc * (jnp.minimum(mag, cap)
                     / jnp.maximum(mag, 1e-9))[..., None]
        f_c = f_c - jnp.sum(ftc, axis=1)
        t_c = t_c - jnp.sum(
            jnp.cross(centers - state.body.pos[:, None], ftc), axis=1)
        cube_wrench = (f_c, t_c)
    if scene.obj_tree is not None and G > 0:
        onehot = (best["id"][..., None] - 2
                  == jnp.arange(G)[None, None]).astype(jnp.float32)  # [E,S,G]
        F_fric = -jnp.einsum("esg,esa->ega", onehot, ft)
        r_sb = centers[:, :, None, :] - bp[:, None, :, :]
        T_fric = -jnp.einsum("esg,esga->ega", onehot,
                             jnp.cross(r_sb, ft[:, :, None, :]))
        tau_o_f, Jp_o, N_o = obj_reaction
        tau_o_f = tau_o_f + (jnp.einsum("egad,ega->ed", Jv_box, F_fric)
                             + jnp.einsum("egad,ega->ed", Jw_box, T_fric))
        obj_reaction = (tau_o_f, Jp_o, N_o)
    if gp is not None:
        K = gp.shape[1]
        onehot_k = (best["id"][..., None] - KOFF
                    == jnp.arange(K)[None, None]).astype(jnp.float32)
        F_fk = -jnp.einsum("esk,esa->eka", onehot_k, ft)
        r_sk = centers[:, :, None, :] - gp[:, None, :, :]
        T_fk = -jnp.einsum("esk,eska->eka", onehot_k,
                           jnp.cross(r_sk, ft[:, :, None, :]))
        tau_o_f, Jp_o, N_o = obj_reaction
        tau_o_f = tau_o_f + (jnp.einsum("ekad,eka->ed", Jv_g, F_fk)
                             + jnp.einsum("ekad,eka->ed", Jw_g, T_fk))
        obj_reaction = (tau_o_f, Jp_o, N_o)

    implicit = dynamics.ImplicitBlocks(Jp=Jp_s, N=N_sphere)
    tau_r = jnp.einsum("esad,esa->ed", Jp_s, F_sphere)

    robot_new = dynamics.step_tree(
        rspec, state.robot, fk_r, M_r, pos_targets, tau_r, h, gravity,
        implicit=implicit, coriolis=coriolis,
    )

    # --- object-side integration ---
    body_new = state.body
    if scene.free_body is not None:
        f_cube, torque_cube = cube_wrench
        # cube corners vs ground
        corners_l = contact.box_corners(scene.free_body.half_extents, E)
        corners_w = state.body.pos[:, None, :] + rot.quat_rotate(
            state.body.quat[:, None, :], corners_l)
        v_c = contact.free_body_point_velocity(state.body, corners_w)
        n_c = jnp.zeros_like(corners_w).at[..., 2].set(1.0)
        cs_c = contact.ContactSet(
            point=corners_w, normal=n_c, depth=corners_w[..., 2],
            active=jnp.ones((E, 8)),
            sphere_idx=jnp.zeros((E, 8), jnp.int32),
            friction=jnp.broadcast_to(
                0.5 * (scene.free_body.friction + 0.1),
                (E,))[:, None].repeat(8, 1),
            v_other=jnp.zeros_like(corners_w),
        )
        force_c, _, _ = contact.penalty_forces(
            cs_c, v_c, p, float(np.asarray(
                scene.free_body.mass).reshape(-1)[0]) / 4.0,
            recede_damp=1.0)
        f_cube = f_cube + jnp.sum(force_c, axis=1)
        torque_cube = torque_cube + jnp.sum(
            jnp.cross(corners_w - state.body.pos[:, None, :], force_c), axis=1)
        # Net per-body contact Δv cap (≙ IsaacGym PhysX
        # max_depenetration_velocity = 1 m/s, a per-BODY budget): purely
        # per-contact budgets still ring when opposing stiff contacts
        # squeeze the body (finger presses cube 13 mm into the ground), and
        # a box_sdf face flip then converts the stored normal force into a
        # single-step multi-m/s lateral kick (scripts/poke_cube.py).
        m_body = jnp.broadcast_to(scene.free_body.mass, (E,))[:, None]
        dv = jnp.linalg.norm(f_cube, axis=-1, keepdims=True) * h / m_body
        dv_scale = jnp.minimum(
            1.0, p.max_depenetration_velocity / jnp.maximum(dv, 1e-9))
        f_cube = f_cube * dv_scale
        # Scale the torque by the same factor: an uncapped contact torque
        # would re-convert to linear motion at the next contact (a
        # squeeze/face-flip angular kick — advisor r4).
        torque_cube = torque_cube * dv_scale
        body_new = contact.integrate_free_body(
            scene.free_body, state.body, f_cube, torque_cube, h, gravity)

    obj_new = state.obj
    if scene.obj_tree is not None:
        ospec = scene.obj_tree
        tau_o, Jv_box, N_box = obj_reaction
        implicit_o = dynamics.ImplicitBlocks(Jp=Jv_box, N=N_box)
        M_o = dynamics.mass_matrix(ospec, fk_o, E)
        obj_new = dynamics.step_tree(
            ospec, state.obj, fk_o, M_o, state.obj.qpos, tau_o, h, gravity,
            implicit=implicit_o, coriolis=coriolis,
        )

    return SceneState(robot=robot_new, obj=obj_new, body=body_new,
                      anchors=new_anchors)


def physics_step(scene: SceneSpec, state: SceneState,
                 pos_targets) -> SceneState:
    """Advance one control step: substeps × inner_substeps inner steps with
    constant PD targets (≙ ``gym.set_dof_position_target_tensor`` +
    ``control_freq_inv`` loop in ``hand_base.py:282-284``).

    Dispatches to the fused Pallas kernel (sim/fused.py) when the scene
    supports it; the jnp graph below is the reference/fallback path."""
    p = scene.params
    if getattr(p, "use_fused", True):
        from . import fused
        E = state.robot.qpos.shape[0]
        # under an active device mesh the Pallas kernel does not partition
        # via GSPMD — run it per-device on the env shard via shard_map
        from ..parallel import mesh as mesh_lib
        m = mesh_lib.active_mesh()
        if m is not None:
            n = int(m.devices.size)
            if (fused.shard_tile(E, n) is not None
                    and fused.fused_supported(scene, E // n)):
                return mesh_lib.shard_physics_step(m, scene, state,
                                                   pos_targets)
        elif fused.fused_supported(scene, E):
            return fused.fused_physics_step(scene, state, pos_targets)
    n = p.substeps * p.inner_substeps
    h = p.dt / n
    gravity = jnp.array([0.0, 0.0, p.gravity])
    if state.anchors is None:
        S = scene.spheres.link_idx.shape[0]
        E = state.robot.qpos.shape[0]
        state = state._replace(anchors=contact.init_anchors(E, S))

    def body(carry, _):
        return _inner_step(scene, carry, pos_targets, h, gravity,
                           p.coriolis), None

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
