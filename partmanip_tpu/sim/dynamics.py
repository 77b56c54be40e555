"""Batched articulated rigid-body dynamics.

Joint-space Lagrangian formulation built from the world-frame link Jacobians
of :mod:`kinematics`:

* mass matrix  ``M = Σ_l m_l Jv_lᵀ Jv_l + Jw_lᵀ I_l^w Jw_l`` — batched
  einsums that map straight onto the MXU;
* velocity-product (Coriolis/centrifugal + gyroscopic) and gravity bias via a
  single forward-mode JVP through FK (no hand-derived Christoffel terms);
* stable high-gain PD position drives via implicit integration
  (Tan et al., "Stable Proportional-Derivative Controllers"), with PhysX-style
  drive effort clamping (≙ Isaac DOF_MODE_POS with the stiffness/damping
  table of ``tasks/load_robot.py:68-79``);
* Coulomb joint friction / damping / armature (≙ the drawer DOF props,
  ``tasks/open_drawer.py:162-167``).

This replaces the PhysX TGS solver for reduced coordinates; contacts enter as
explicit generalized forces plus optional implicit damping/stiffness blocks
assembled by :mod:`contacts`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.linalg import spd_solve
from . import kinematics
from .types import TreeSpec, TreeState

# Stiction linearization velocity (m/s or rad/s): below this, Coulomb
# friction acts as implicit viscous damping (exact linearization of the
# clipped-friction law).
_FRICTION_VEPS = 1e-3

# Brake-early factor of the saturated-drive switching curve (see step_tree):
# < 1 starts decelerating before the diagonal-mass time-optimal point, which
# absorbs the error of neglecting the off-diagonal inertia coupling.
_BRAKE_BETA = 0.25

# Floor of the saturated-drive velocity boundary layer (rad/s resp. m/s):
# the implicit servo slope is capped at effort/_SAT_VEPS for very heavy or
# weak dofs where one substep's velocity quantum effort·h/M is below this.
_SAT_VEPS = 1e-2


def mass_matrix(spec: TreeSpec, fk, E: int) -> jnp.ndarray:
    """Joint-space inertia matrix [E, D, D] (+armature, padded-dof identity)."""
    jv, jw, _ = kinematics.link_jacobians(spec, fk)  # [E, L, 3, D]
    L = spec.num_links
    mass = jnp.broadcast_to(spec.mass * spec.link_mask, (E, L))
    # world-frame rotational inertia per link: R I Rᵀ
    from ..ops import rotations as rot

    Rm = rot.quat_to_mat(fk.link_quat)  # [E, L, 3, 3]
    I_l = jnp.broadcast_to(spec.inertia, (E, L, 3, 3))
    Iw = jnp.einsum("elab,elbc,eldc->elad", Rm, I_l, Rm)
    M = jnp.einsum("el,elad,elaf->edf", mass, jv, jv)
    M = M + jnp.einsum("elad,elab,elbf->edf", jw, Iw, jw)
    dm = jnp.broadcast_to(spec.dof_mask, (E, spec.num_dofs))
    arm = jnp.broadcast_to(spec.dof_armature, dm.shape)
    M = M + jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(
        arm * dm + (1.0 - dm)
    )
    return M


def bias_forces(spec: TreeSpec, state: TreeState, gravity: jnp.ndarray,
                coriolis: bool = True, fk=None) -> jnp.ndarray:
    """Generalized bias τ_bias with  M q̈ = τ_applied − τ_bias.

    τ_bias = C(q, q̇) q̇ + g(q).  The velocity-product term uses the analytic
    time-derivative of the world-frame Jacobian columns,

        for dof d with world axis a_d, anchor p_d on child link c(d):
            ȧ_d = ω_{c(d)} × a_d
            revolute  col:  d/dt [a_d × (x − p_d)] = ȧ_d × (x − p_d)
                                                     + a_d × (ẋ − ṗ_d)
            prismatic col:  d/dt a_d = ȧ_d

    — closed-form and branch-free (an autodiff JVP through the FK sweep is
    numerically identical but makes the XLA:TPU compile blow up; the JVP
    variant is kept below for cross-validation in tests).
    """
    E, D = state.qpos.shape
    L = spec.num_links
    from ..ops import rotations as rot

    if fk is None:
        fk = kinematics.forward_kinematics(spec, state)
    jv, jw, com_w = kinematics.link_jacobians(spec, fk)
    qv = state.qvel
    v = jnp.einsum("elad,ed->ela", jv, qv)        # link COM lin vel
    w = jnp.einsum("elad,ed->ela", jw, qv)        # link ang vel

    mass = jnp.broadcast_to(spec.mass * spec.link_mask, (E, L))
    Rm = rot.quat_to_mat(fk.link_quat)
    Iw = jnp.einsum("elab,elbc,eldc->elad", Rm,
                    jnp.broadcast_to(spec.inertia, (E, L, 3, 3)), Rm)

    # gravity: τ_g = Σ_l Jvᵀ m g  (scaled per-articulation; Isaac
    # disable_gravity ≙ gravity_scale 0)
    gscale = jnp.broadcast_to(spec.gravity_scale, (E,))
    g_force = mass[..., None] * gravity[None, None, :] * gscale[:, None, None]
    tau = -jnp.einsum("elad,ela->ed", jv, g_force)

    if coriolis:
        rev, pris = kinematics._dof_kind(spec, E)             # [E, D]
        dof_child = jnp.broadcast_to(spec.dof_child, (E, D))
        w_c = kinematics._take_env(w, dof_child)              # [E, D, 3]
        # anchor (child link origin) velocities via its own jacobian rows
        j_anchor = kinematics.frame_jacobian(spec, fk, dof_child)  # [E,D,6,Dq]
        v_anchor = jnp.einsum("edaf,ef->eda", j_anchor[:, :, :3], qv)
        a = fk.dof_axis_w                                     # [E, D, 3]
        adot = jnp.cross(w_c, a)

        anc = jnp.broadcast_to(spec.ancestor, (E, L, D))
        r = com_w[:, :, None, :] - fk.dof_anchor_w[:, None, :, :]   # [E,L,D,3]
        dv = v[:, :, None, :] - v_anchor[:, None, :, :]             # [E,L,D,3]
        col_rev = jnp.cross(adot[:, None], r) + jnp.cross(a[:, None], dv)
        jdotv = ((col_rev * rev[:, None, :, None]
                  + adot[:, None] * pris[:, None, :, None])
                 * anc[..., None] * qv[:, None, :, None]).sum(axis=2)  # [E,L,3]
        jdotw = (adot[:, None] * (rev * qv)[:, None, :, None]
                 * anc[..., None]).sum(axis=2)                          # [E,L,3]

        gyro = jnp.cross(w, jnp.einsum("elab,elb->ela", Iw, w))
        tau = tau + jnp.einsum("elad,ela->ed", jv, mass[..., None] * jdotv)
        tau = tau + jnp.einsum(
            "elad,ela->ed", jw,
            jnp.einsum("elab,elb->ela", Iw, jdotw) + gyro)

    dm = jnp.broadcast_to(spec.dof_mask, (E, D))
    return tau * dm


def bias_forces_jvp(spec: TreeSpec, state: TreeState, gravity: jnp.ndarray,
                    coriolis: bool = True) -> jnp.ndarray:
    """Autodiff (JVP-through-FK) reference implementation of
    :func:`bias_forces` — used only by tests to cross-validate the analytic
    velocity-product terms."""
    E, D = state.qpos.shape
    L = spec.num_links
    from ..ops import rotations as rot

    def link_vels(qpos):
        st = state._replace(qpos=qpos)
        fk = kinematics.forward_kinematics(spec, st)
        jv, jw, com_w = kinematics.link_jacobians(spec, fk)
        v = jnp.einsum("elad,ed->ela", jv, state.qvel)
        w = jnp.einsum("elad,ed->ela", jw, state.qvel)
        return (v, w), (jv, jw, fk)

    (v, w), (jv, jw, fk) = link_vels(state.qpos)
    mass = jnp.broadcast_to(spec.mass * spec.link_mask, (E, L))
    Rm = rot.quat_to_mat(fk.link_quat)
    Iw = jnp.einsum("elab,elbc,eldc->elad", Rm,
                    jnp.broadcast_to(spec.inertia, (E, L, 3, 3)), Rm)
    gscale = jnp.broadcast_to(spec.gravity_scale, (E,))
    g_force = mass[..., None] * gravity[None, None, :] * gscale[:, None, None]
    tau = -jnp.einsum("elad,ela->ed", jv, g_force)
    if coriolis:
        (vdot_b, wdot_b) = jax.jvp(
            lambda q: link_vels(q)[0], (state.qpos,), (state.qvel,))[1]
        gyro = jnp.cross(w, jnp.einsum("elab,elb->ela", Iw, w))
        tau = tau + jnp.einsum("elad,ela->ed", jv, mass[..., None] * vdot_b)
        tau = tau + jnp.einsum(
            "elad,ela->ed", jw,
            jnp.einsum("elab,elb->ela", Iw, wdot_b) + gyro)
    dm = jnp.broadcast_to(spec.dof_mask, (E, D))
    return tau * dm


class ImplicitBlocks(NamedTuple):
    """Extra implicit contact terms for the joint-space solve, aggregated per
    attachment point: point Jacobians Jp [E, P, 3, D] and 3×3 normal
    operators N [E, P, 3, 3] (N already carries its h·cd + h²·kn factors),
    contributing  A += Σ_p Jpᵀ N Jp."""

    Jp: jnp.ndarray
    N: jnp.ndarray


def step_tree(
    spec: TreeSpec,
    state: TreeState,
    fk,
    M: jnp.ndarray,
    pos_targets: jnp.ndarray,
    tau_ext: jnp.ndarray,
    h: float,
    gravity: jnp.ndarray,
    implicit: Optional[ImplicitBlocks] = None,
    coriolis: bool = True,
) -> TreeState:
    """One semi-implicit integration step of a driven articulation.

    Solves (M + h·D_imp + h²·K_imp) q̈ = τ_drive + τ_fric + τ_ext − τ_bias,
    then  q̇ ← clip(q̇ + h q̈),  q ← clip(q + h q̇)  with joint limits.
    """
    E, D = state.qpos.shape
    q, qv = state.qpos, state.qvel
    dm = jnp.broadcast_to(spec.dof_mask, (E, D))
    kp = jnp.broadcast_to(spec.drive_kp, (E, D))
    kd = jnp.broadcast_to(spec.drive_kd, (E, D))
    effort = jnp.broadcast_to(spec.dof_effort, (E, D))
    fric = jnp.broadcast_to(spec.dof_friction, (E, D))
    damping = jnp.broadcast_to(spec.dof_damping, (E, D))

    # PD drive torque, linearized implicitly:
    #   τ(q⁺, q̇⁺) ≈ τ₀ − (h²·kp + h·kd)·q̈   with   τ₀ = kp(q* − q − h q̇) − kd q̇
    tau_d0 = kp * (pos_targets - q - h * qv) - kd * qv

    # Coulomb joint friction, linearized to viscous inside |q̇| < veps.
    tau_fric = -fric * jnp.clip(qv / _FRICTION_VEPS, -1.0, 1.0)
    d_fric = fric / _FRICTION_VEPS * (jnp.abs(qv) < _FRICTION_VEPS)

    bias = bias_forces(spec, state, gravity, coriolis=coriolis, fk=fk)

    def assemble(unsat, b_extra=0.0):
        diag = (h * (kd * unsat + b_extra + damping + d_fric)
                + (h * h) * (kp * unsat))
        A = M + jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(diag * dm)
        if implicit is not None:
            A = A + jnp.einsum(
                "epad,epab,epbf->edf", implicit.Jp, implicit.N, implicit.Jp)
        return A

    # Pass 1: fully implicit (ignore effort limits), then read off the
    # end-of-step drive torque each dof would need.  Deciding saturation from
    # the *implicit* torque (not τ₀) avoids bang-bang chatter at the limit.
    ones = jnp.ones_like(q)
    rhs1 = (tau_d0 + tau_fric + tau_ext - bias) * dm
    qacc1 = spd_solve(assemble(ones), rhs1) * dm
    tau_imp = tau_d0 - (h * h * kp + h * kd) * qacc1
    sat = (jnp.abs(tau_imp) > effort).astype(q.dtype)
    unsat = 1.0 - sat

    # Pass 2: saturated dofs.  A constant sign(tau_imp)·effort is an
    # *undamped* bang-bang: at these gains (kp 1e6, effort 87) any visible
    # position error keeps |kp·err| ≫ effort, so the clipped-PD sign equals
    # sign(err) until the target is crossed and the kd term never manifests
    # — under per-step moving targets the joints limit-cycle at their
    # velocity limits, turning the gripper into a ~1 m/s hammer.  PhysX's
    # TGS re-solves the clamped drive 16× per substep, switching to braking
    # *within* the step; we emulate that re-linearization with an
    # effort-limited velocity servo toward the time-optimal approach speed
    #     v*(err) = sign(err)·min(vel_limit, |err|/h, √(2·β·a_max·|err|)),
    #     a_max   = effort / M_d   (M_d = the dof's TRUE diagonal inertia —
    #               the deceleration the clamp can actually deliver;
    #               |err|/h is the no-overshoot deadbeat position cap),
    # applied as the *implicit* servo  τ_sat(q̇⁺) = b·(v* − q̇⁺)  with the
    # adaptive slope  b = effort / max(|v*−q̇|, ε):
    #   · at the linearization point |τ| = effort exactly (far regime:
    #     h·b ≪ M_d, i.e. a constant full-effort push/brake);
    #   · q̇⁺ lands monotonically between q̇ and v*, so |τ| ≤ effort holds
    #     at the end-of-step velocity too — no clip, no branches;
    #   · as |v*−q̇| → ε the slope blows up (h·b ≫ M_d) and the servo
    #     becomes a hard velocity constraint that off-diagonal inertia
    #     coupling cannot defeat (a fixed deadbeat gain — the previous
    #     scheme — either chatters when explicit or, softened to the
    #     stability bound M_d/h, loses to coupling torques and lets light
    #     wrist dofs overshoot ~6 mrad per commanded step, which flails
    #     the arm under per-step moving IK targets; scripts/probe_drive.py
    #     shows the per-substep transients).
    # Unsaturated dofs stay fully implicit — clipped-PD semantics unchanged
    # where the clamp is inactive.
    M_diag = M.reshape(E, D * D)[:, :: D + 1]
    vel_lim = jnp.broadcast_to(spec.dof_vel_limit, (E, D))
    a_max = effort / jnp.maximum(M_diag, 1e-9)
    err = pos_targets - q
    v_opt = jnp.sign(err) * jnp.minimum(
        vel_lim, jnp.minimum(jnp.abs(err) / h,
                             jnp.sqrt(2.0 * _BRAKE_BETA * a_max
                                      * jnp.abs(err))))
    dv = v_opt - qv
    b_imp = sat * effort / jnp.maximum(jnp.abs(dv), _SAT_VEPS)
    tau_drive = b_imp * dv + unsat * tau_d0
    rhs = (tau_drive + tau_fric + tau_ext - bias) * dm
    qacc = spd_solve(assemble(unsat, b_imp), rhs) * dm

    qv_new = jnp.clip(qv + h * qacc, -vel_lim, vel_lim)
    q_new = q + h * qv_new
    lower = jnp.broadcast_to(spec.dof_lower, (E, D))
    upper = jnp.broadcast_to(spec.dof_upper, (E, D))
    q_clamped = jnp.clip(q_new, lower, upper)
    # kill velocity into an active limit
    at_lo = (q_new < lower) & (qv_new < 0)
    at_hi = (q_new > upper) & (qv_new > 0)
    qv_new = jnp.where(at_lo | at_hi, 0.0, qv_new) * dm
    return state._replace(qpos=q_clamped * dm, qvel=qv_new)
