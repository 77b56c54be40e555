"""SDF penalty contacts + free rigid-body dynamics.

Replaces PhysX's SDF-mode collision (URDF ``<sdf resolution>``,
``franka_panda_sdf_mobile.urdf:231``) with differentiable signed-distance
queries: robot collision spheres against analytic box SDFs (procedural
assets), grid SDFs (imported meshes, see ``ops/sdf.py``) and the ground
plane.  Forces are regularized-Coulomb penalties, mapped into joint space via
point Jacobians; the normal/tangential damping also feeds the implicit solve
blocks of :mod:`dynamics` for stiff-stable integration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import rotations as rot
from ..ops.linalg import inv3
from . import kinematics
from .types import (BoxGeoms, FreeBodySpec, FreeBodyState, SimParams,
                    SphereGeoms, TreeSpec)


def box_sdf(p: jnp.ndarray, half: jnp.ndarray):
    """Signed distance and outward normal of axis-aligned box(es) at local
    points p.  Branchless; correct inside and outside.

    Args:
        p: [..., 3] points in box frame.
        half: [..., 3] half extents.
    Returns:
        (dist [...], normal [..., 3] in box frame)
    """
    q = jnp.abs(p) - half
    q_out = jnp.maximum(q, 0.0)
    d_out = jnp.linalg.norm(q_out, axis=-1)
    d_in = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    dist = d_out + d_in

    sgn = jnp.where(p >= 0, 1.0, -1.0)
    n_out = sgn * q_out / jnp.maximum(d_out, 1e-9)[..., None]
    # inside: face of least penetration
    inside_face = (q == jnp.max(q, axis=-1, keepdims=True)).astype(p.dtype)
    n_in = sgn * inside_face
    n_in = n_in / jnp.maximum(jnp.linalg.norm(n_in, axis=-1, keepdims=True), 1e-9)
    outside = (d_out > 0)[..., None]
    normal = jnp.where(outside, n_out, n_in)
    return dist, normal


class ContactSet(NamedTuple):
    """A batch of candidate contacts on robot spheres.

    All arrays [E, C, ...]; inactive entries masked by ``active``.
    """

    point: jnp.ndarray    # world contact point (sphere center)
    normal: jnp.ndarray   # world normal, pointing toward the sphere
    depth: jnp.ndarray    # signed gap (negative = penetrating)
    active: jnp.ndarray   # f32 mask
    sphere_idx: jnp.ndarray  # i32 which robot sphere
    friction: jnp.ndarray    # combined μ
    # velocity of the *other* body at the contact point (world)
    v_other: jnp.ndarray


def sphere_positions(spec: TreeSpec, fk, spheres: SphereGeoms, E: int):
    """World positions of robot collision spheres [E, S, 3]."""
    S = spheres.link_idx.shape[0]
    li = jnp.broadcast_to(spheres.link_idx[None], (E, S))
    lp = kinematics._take_env(fk.link_pos, li)
    lq = kinematics._take_env(fk.link_quat, li)
    off = jnp.broadcast_to(spheres.offset[None], (E, S, 3))
    return lp + rot.quat_rotate(lq, off)


def spheres_vs_ground(centers, radii, mu_s, ground_mu: float = 0.1):
    """Contacts of spheres against the z=0 plane (``hand_base.py:123-129``:
    plane friction 0.1)."""
    E, S = centers.shape[:2]
    depth = centers[..., 2] - radii[None]
    normal = jnp.zeros_like(centers).at[..., 2].set(1.0)
    return ContactSet(
        point=centers,
        normal=normal,
        depth=depth,
        active=jnp.ones((E, S)),
        sphere_idx=jnp.broadcast_to(jnp.arange(S)[None], (E, S)),
        friction=jnp.broadcast_to(0.5 * (mu_s + ground_mu)[None], (E, S)),
        v_other=jnp.zeros_like(centers),
    )


def spheres_vs_boxes(
    centers, radii, mu_s,
    box_pos, box_quat, box_half, box_mask, box_mu,
    v_box_fn,
):
    """All-pairs sphere × box contacts.

    Args:
        centers: [E, S, 3]; radii, mu_s: [S]
        box_pos/quat/half/mask/mu: [E, G, ...] world box poses
        v_box_fn: callable(point [E, S, G, 3], gidx) → velocity of box surface
            points [E, S, G, 3] (captures the owning body's state)
    Returns:
        ContactSet with C = S*G, plus the box index per contact [E, C].
    """
    E, S = centers.shape[:2]
    G = box_pos.shape[1]
    # sphere centers in each box frame
    rel = centers[:, :, None, :] - box_pos[:, None, :, :]          # [E,S,G,3]
    bq = jnp.broadcast_to(box_quat[:, None], (E, S, G, 4))
    p_local = rot.quat_rotate_inverse(bq, rel)
    dist, n_local = box_sdf(p_local, jnp.broadcast_to(box_half[:, None], (E, S, G, 3)))
    n_world = rot.quat_rotate(bq, n_local)
    depth = dist - radii[None, :, None]

    pts = centers[:, :, None, :].repeat(G, axis=2)
    v_other = v_box_fn(pts)

    cs = ContactSet(
        point=pts.reshape(E, S * G, 3),
        normal=n_world.reshape(E, S * G, 3),
        depth=depth.reshape(E, S * G),
        active=jnp.broadcast_to(box_mask[:, None], (E, S, G)).reshape(E, S * G),
        sphere_idx=jnp.broadcast_to(
            jnp.arange(S)[None, :, None], (E, S, G)).reshape(E, S * G),
        friction=(0.5 * (mu_s[None, :, None] + box_mu[:, None, :])
                  ).reshape(E, S * G),
        v_other=v_other.reshape(E, S * G, 3),
    )
    box_idx = jnp.broadcast_to(jnp.arange(G)[None, None], (E, S, G)).reshape(E, S * G)
    return cs, box_idx


def penalty_forces(cs: ContactSet, v_self, params: SimParams, m_eff: float = 0.1,
                   tangential: bool = True, recede_damp: float = 0.0):
    """Regularized penalty contact forces, strictly dissipative per step.

    F = fn·n + ft with

    * spring   fn_k = max(0, −kn·φ), capped so one inner step cannot impart
      more than ``max_depenetration_velocity`` (PhysX knob,
      cfg/base_cfg.yaml:42);
    * damping  fn_d = cd·max(0, −vn), impulse-capped at m_eff·(−vn)/h so a
      discrete step can stop the approach but never reverse it (inelastic
      impact — no penalty-slap energy injection);
    * friction ft = −min(μ·fn, kt·|vt|, m_eff·|vt|/h)·t̂ with the same
      no-reversal cap.

    ``m_eff`` is the reduced mass of the pair (pass the lighter body's mass).
    Returns (force [E, C, 3], fn [E, C], active mask [E, C]).
    """
    kn = params.contact_kn
    h = params.h
    cd = 2.0 * params.contact_damping_ratio * jnp.sqrt(kn * m_eff)
    v_rel = v_self - cs.v_other
    vn = jnp.sum(v_rel * cs.normal, axis=-1)
    vt = v_rel - vn[..., None] * cs.normal
    vt_norm = jnp.linalg.norm(vt, axis=-1)

    touching = (cs.depth < 0.0).astype(cs.depth.dtype) * cs.active
    # The impulse caps budget the *total* momentum change of the body, so
    # each of n simultaneous contacts gets 1/n of it — otherwise multiple
    # pads over-stop the body, reversing its velocity and pumping energy
    # (restitution > 1) until it ejects.
    n_act = jnp.maximum(1.0, jnp.sum(touching, axis=-1, keepdims=True))
    m_c = m_eff / n_act
    # velocity-anticipating spring: evaluate the penalty at the predicted
    # end-of-step gap φ + h·vn (stabilizes the explicitly-integrated bodies
    # at h = dt/(substeps·inner))
    depth_pred = cs.depth + h * vn
    # The depenetration budget counts the already-achieved separation speed:
    # PhysX's maxDepenetrationVelocity caps the TOTAL velocity depenetration
    # may introduce, not a per-inner-step increment.  With a per-step cap, a
    # body held in penetration (e.g. the cube squeezed between a descending
    # finger and the ground) is pumped by up to max_depen EVERY inner step
    # and ejects at several m/s once freed (measured 2.3 m/s for a 0.3 m/s
    # fingertip poke — scripts/poke_cube.py).  While approaching (vn ≤ 0)
    # this is identical to the plain cap, so the change is strictly
    # dissipative.
    depen_budget = jnp.maximum(
        0.0, params.max_depenetration_velocity - jnp.maximum(vn, 0.0))
    fn_spring = jnp.minimum(
        jnp.maximum(0.0, -kn * jnp.minimum(cs.depth, depth_pred)),
        m_c * depen_budget / h,
    )
    approach = jnp.maximum(0.0, -vn)
    fn_damp = jnp.minimum(cd * approach, m_c * approach / h)
    # Recede damping (restitution → 0) for light FREE bodies: without it a
    # body squeezed between two opposing stiff contacts exits each bounce
    # at the full depenetration budget (the spring re-accelerates it to
    # max_depen every inner step) and chatters at ±max_depen indefinitely —
    # measured ±1 m/s on the pinched cube, rectified upward by the ground
    # into a steady climb.  The damper is impulse-capped so it can at most
    # cancel the recede velocity (inelastic, never sticky); gated off by
    # default so articulated-partner contacts (drawer pulls) keep their
    # calibrated dynamics.
    recede = jnp.maximum(0.0, vn)
    fn_rec = recede_damp * jnp.minimum(cd * recede, m_c * recede / h)
    fn = jnp.maximum(0.0, fn_spring + fn_damp - fn_rec) * touching
    if tangential:
        ft_mag = jnp.minimum(
            jnp.minimum(cs.friction * fn, params.contact_kt * vt_norm),
            m_c * vt_norm / h,
        )
        ft = -ft_mag[..., None] * vt / jnp.maximum(vt_norm, 1e-6)[..., None]
        force = fn[..., None] * cs.normal + ft
    else:
        # tangential handled by the stick-slip anchors (engine level)
        force = fn[..., None] * cs.normal
    return force, fn, touching


def integrate_free_body(
    spec: FreeBodySpec, state: FreeBodyState, force, torque, h: float,
    gravity: jnp.ndarray,
):
    """Semi-implicit Newton-Euler step for a free rigid body (the cube)."""
    E = state.pos.shape[0]
    m = jnp.broadcast_to(spec.mass, (E,))[:, None]
    gscale = jnp.broadcast_to(spec.gravity_scale, (E,))[:, None]
    R = rot.quat_to_mat(state.quat)
    Iw = jnp.einsum("eab,ebc,edc->ead",
                    R, jnp.broadcast_to(spec.inertia, (E, 3, 3)), R)
    Iw_inv = inv3(Iw)

    linacc = force / m + gravity[None] * gscale
    gyro = jnp.cross(state.angvel, jnp.einsum("eab,eb->ea", Iw, state.angvel))
    angacc = jnp.einsum("eab,eb->ea", Iw_inv, torque - gyro)

    linvel = jnp.clip(state.linvel + h * linacc, -20.0, 20.0)
    angvel = jnp.clip(state.angvel + h * angacc, -50.0, 50.0)
    pos = state.pos + h * linvel
    dq = 0.5 * h * jnp.concatenate([angvel, jnp.zeros((E, 1))], axis=-1)
    quat = rot.quat_unit(state.quat + rot.quat_mul(dq, state.quat))
    return FreeBodyState(pos=pos, quat=quat, linvel=linvel, angvel=angvel)


def free_body_point_velocity(state: FreeBodyState, points):
    """Velocity of world points rigidly attached to the body. points [E,...,3]."""
    r = points - state.pos.reshape(state.pos.shape[0], *([1] * (points.ndim - 2)), 3)
    w = state.angvel.reshape(r.shape[0], *([1] * (points.ndim - 2)), 3)
    v = state.linvel.reshape(r.shape[0], *([1] * (points.ndim - 2)), 3)
    return v + jnp.cross(w, r)


def box_corners(half: jnp.ndarray, E: int):
    """The 8 corners of a box, body frame. half: [E?, 3] → [E, 8, 3]."""
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=jnp.float32,
    )
    return signs[None] * jnp.broadcast_to(half, (E, 3))[:, None, :]


class AnchorState(NamedTuple):
    """Per-sphere tangential stick anchors (static friction state).

    PhysX resolves static friction inside its solver; a stateless viscous
    regularization cannot transmit force at zero slip, which dead-locks
    friction-grip pulls (drawer handles).  The standard fix is a spring-
    clutch: each sphere stores the contact point in its partner body's local
    frame; the tangential force is a stiff spring to that anchor, clamped to
    the friction cone with return mapping (sliding drags the anchor along).
    """

    point: jnp.ndarray   # f32 [E, S, 3] anchor in partner-local coordinates
    body: jnp.ndarray    # i32 [E, S] partner id (-1 none; engine-defined)


def init_anchors(E: int, S: int) -> AnchorState:
    return AnchorState(point=jnp.zeros((E, S, 3)),
                       body=jnp.full((E, S), -1, jnp.int32))


ANCHOR_KS = 2.0e3       # tangential spring stiffness [N/m]
ANCHOR_ZETA = 1.0       # damping ratio of the tangential spring
# Per-inner-step velocity margin of the free-body-side anchor reaction cap
# (engine.py / fused.py): at perfect stick the tangential contact may still
# exert m·HOLD/h (≈ 6 N for the 0.125 kg cube) to hold a grasped body, but
# a sweep can only accelerate it to ~the finger's tangential speed.
FREE_BODY_HOLD_VEL = 0.05  # [m/s]


def anchor_friction(
    sphere_pos, sphere_vel, normal, fn, mu, touching, partner_id,
    anchor: AnchorState, to_local, to_world, partner_vel,
    params: SimParams, m_eff,
):
    """Stick-slip tangential forces for one sphere set.

    Args:
        sphere_pos/vel: [E, S, 3] current sphere state (world).
        normal, fn, mu, touching: [E, S(,3)] of the *selected* contact.
        partner_id: [E, S] i32 partner body id of the selected contact.
        anchor: previous AnchorState.
        to_local(points, pid): world → partner-local for the given partner.
        to_world(points, pid): partner-local → world.
        partner_vel: [E, S, 3] partner surface velocity at the sphere.
    Returns:
        (force [E, S, 3] to apply to the sphere, new AnchorState,
         stick mask [E, S]).
    """
    h = params.h
    cdt = 2.0 * ANCHOR_ZETA * jnp.sqrt(ANCHOR_KS * m_eff)

    same = (anchor.body == partner_id) & (partner_id >= 0) & (touching > 0)
    anchor_world = to_world(anchor.point, anchor.body)
    # tangential offset from the anchor (project out the current normal)
    delta = sphere_pos - anchor_world
    delta_t = delta - jnp.sum(delta * normal, -1, keepdims=True) * normal
    v_rel = sphere_vel - partner_vel
    vt = v_rel - jnp.sum(v_rel * normal, -1, keepdims=True) * normal

    ft_raw = -ANCHOR_KS * delta_t - cdt * vt
    ft_raw = jnp.where(same[..., None], ft_raw, -cdt * vt * (touching > 0)[..., None])
    ft_mag = jnp.linalg.norm(ft_raw, axis=-1)
    limit = mu * fn
    stick = (ft_mag <= limit) & same
    scale = jnp.where(ft_mag > 1e-9, jnp.minimum(limit / jnp.maximum(ft_mag, 1e-9), 1.0), 0.0)
    ft = ft_raw * scale[..., None]
    ft = ft * (touching > 0)[..., None]

    # return mapping: when sliding, drag the anchor so the spring force
    # equals the clamped (cone-boundary) force
    slid_world = sphere_pos + ft / ANCHOR_KS
    new_world = jnp.where(stick[..., None], anchor_world, slid_world)
    new_local = to_local(new_world, partner_id)
    new_anchor = AnchorState(
        point=jnp.where((touching > 0)[..., None], new_local, anchor.point),
        body=jnp.where(touching > 0, partner_id, -1),
    )
    return ft, new_anchor, stick
