"""Franka task-space control: the TPU-native ``franka`` robot abstraction.

Re-creates the drive-mode semantics of the reference robot class
(``tasks/load_robot.py``): ``ik`` (7(+3) actions), ``pos`` (8(+3)),
``ik_abs`` (8(+3)) and the debug ``heuristic`` servo, including

* action scaling: Δpose × 0.005, gripper × dt/5, mobile base × 0.005
  rotated into the root frame (``load_robot.py:97-116``);
* damped least-squares IK with λ=0.05 on the mean of the two fingertip
  Jacobians (``load_robot.py:142-151``), arm columns only;
* the per-step cached robot state ("update_state",
  ``load_robot.py:153-164``): averaged tip rigid-body row, 9D tip rotation,
  gripper length, normalized qpos.

Everything is a pure function of (spec, fk, state); the Jacobian comes from
our analytic FK instead of ``acquire_jacobian_tensor``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import rotations as rot
from ..sim import engine, kinematics
from ..sim.types import TreeSpec, TreeState

IK_DAMPING = 0.05          # load_robot.py:143
POSE_ACTION_SCALE = 0.005  # load_robot.py:98,109-110
HEURISTIC_GRASP_POSE = (-0.2, 0.0, 0.4, -0.5, 0.5, 0.5, -0.5)  # load_robot.py:128


class RobotView(NamedTuple):
    """Per-step cached robot quantities (≙ ``franka.update_state``)."""

    tip_state: jnp.ndarray       # [E, 13] mean of the two tip body rows
    ltip_state: jnp.ndarray      # [E, 13]
    rtip_state: jnp.ndarray      # [E, 13]
    tip_pos: jnp.ndarray         # [E, 3]
    tip_rot: jnp.ndarray         # [E, 3, 3]
    gripper_length: jnp.ndarray  # [E]
    qpos_normalized: jnp.ndarray  # [E, D]
    qpos: jnp.ndarray            # [E, D]
    qvel: jnp.ndarray            # [E, D]
    tip_jacobian: jnp.ndarray    # [E, 6, n_arm] mean tip spatial Jacobian


class FrankaControlConfig(NamedTuple):
    drive_mode: str = "ik"
    mobile: bool = False
    dt: float = 1.0 / 60.0
    num_dofs: int = 9
    lefttip_idx: int = 0
    righttip_idx: int = 0
    root_quat: tuple = (0.0, 0.0, 0.0, 1.0)  # default root for base rotation

    @property
    def num_actions(self) -> int:
        base = {"ik": 7, "pos": 8, "ik_abs": 8, "heuristic": 1}[self.drive_mode]
        return base + (3 if self.mobile else 0)

    @property
    def nb(self) -> int:
        return 3 if self.mobile else 0


def robot_view(cfg: FrankaControlConfig, spec: TreeSpec, fk,
               state: TreeState) -> RobotView:
    E = state.qpos.shape[0]
    idx = jnp.broadcast_to(
        jnp.array([cfg.lefttip_idx, cfg.righttip_idx]), (E, 2))
    tips = engine.rigid_body_state(spec, fk, state, idx)  # [E, 2, 13]
    ltip, rtip = tips[:, 0], tips[:, 1]
    tip = 0.5 * (ltip + rtip)
    lower = jnp.broadcast_to(spec.dof_lower, state.qpos.shape)
    upper = jnp.broadcast_to(spec.dof_upper, state.qpos.shape)
    qn = 2.0 * (state.qpos - lower) / (upper - lower + 1e-12) - 1.0

    J = kinematics.frame_jacobian(spec, fk, idx)  # [E, 2, 6, D]
    j_eef = 0.5 * (J[:, 0] + J[:, 1])
    j_eef = j_eef[..., cfg.nb:cfg.num_dofs - 2]   # arm columns only

    return RobotView(
        tip_state=tip, ltip_state=ltip, rtip_state=rtip,
        tip_pos=tip[:, :3], tip_rot=rot.quat_to_mat(tip[:, 3:7]),
        gripper_length=jnp.linalg.norm(ltip[:, :3] - rtip[:, :3], axis=-1),
        qpos_normalized=qn, qpos=state.qpos, qvel=state.qvel,
        tip_jacobian=j_eef,
    )


def solve_ik(j_eef: jnp.ndarray, dpose: jnp.ndarray) -> jnp.ndarray:
    """Damped least-squares: u = Jᵀ (J Jᵀ + λ²I)⁻¹ dpose
    (≙ ``load_robot.py:142-151``)."""
    from ..ops.linalg import spd_solve
    lmbda = (IK_DAMPING ** 2) * jnp.eye(6, dtype=dpose.dtype)
    jt = jnp.swapaxes(j_eef, -1, -2)
    A = j_eef @ jt + lmbda
    return jnp.einsum("...dk,...k->...d", jt, spd_solve(A, dpose))


def compute_targets(cfg: FrankaControlConfig, spec: TreeSpec,
                    view: RobotView, actions: jnp.ndarray) -> jnp.ndarray:
    """Map raw policy actions to PD position targets [E, D]
    (≙ ``franka.control``, ``load_robot.py:96-140``)."""
    E, D = view.qpos.shape
    nb = cfg.nb
    q = view.qpos
    targets = jnp.array(q)
    raw = actions

    dpose_base = jnp.zeros((E, 3), q.dtype)
    if cfg.mobile:
        dpose_base = raw[:, :3] * POSE_ACTION_SCALE
        root_r = rot.quat_to_mat(jnp.asarray(cfg.root_quat, q.dtype))
        base_delta = jnp.einsum("ba,eb->ea", root_r, dpose_base)  # Rᵀ·d
        targets = targets.at[:, :3].set(q[:, :3] + base_delta)
        raw = raw[:, 3:]

    if cfg.drive_mode == "pos":
        arm = q[:, nb:-2] + raw[:, :-1] * cfg.dt * 20.0
        grip = q[:, -2:] + raw[:, -1:] * cfg.dt
        targets = targets.at[:, nb:-2].set(arm)
        targets = targets.at[:, -2:].set(grip)
    elif cfg.drive_mode == "ik":
        pos_err = raw[:, :3] * POSE_ACTION_SCALE
        orn_err = raw[:, 3:6] * POSE_ACTION_SCALE
        dpose = jnp.concatenate([pos_err, orn_err], axis=-1)
        # mobile: the commanded base translation is subtracted from the
        # task-space delta so arm IK solves only the residual
        # (load_robot.py:112-113; subtraction uses the *unrotated* delta).
        dpose = dpose.at[:, :3].add(-dpose_base)
        u = solve_ik(view.tip_jacobian, dpose)
        targets = targets.at[:, nb:-2].set(q[:, nb:-2] + u)
        grip = q[:, -2:] + raw[:, -1:] * cfg.dt / 5.0
        targets = targets.at[:, -2:].set(grip)
    elif cfg.drive_mode == "ik_abs":
        pos_err = raw[:, :3] - view.tip_pos
        target_q = raw[:, 3:7] / (
            jnp.linalg.norm(raw[:, 3:7], axis=-1, keepdims=True) + 1e-8)
        orn_err = rot.orientation_error(target_q, view.tip_state[:, 3:7])
        dpose = jnp.concatenate([pos_err, orn_err], axis=-1)
        u = solve_ik(view.tip_jacobian, dpose)
        targets = targets.at[:, nb:-2].set(q[:, nb:-2] + u)
        up = jnp.broadcast_to(spec.dof_upper, (E, D))[:, -1]
        lo = jnp.broadcast_to(spec.dof_lower, (E, D))[:, -1]
        grip = (raw[:, -1:] * (up - lo)[:, None] / 2
                + (up + lo)[:, None] / 2)
        targets = targets.at[:, -2:].set(grip)
    elif cfg.drive_mode == "heuristic":
        gp = jnp.asarray(HEURISTIC_GRASP_POSE, q.dtype)
        pos_err = gp[None, :3] - view.tip_pos
        orn_err = rot.orientation_error(
            jnp.broadcast_to(gp[None, 3:7], (E, 4)), view.tip_state[:, 3:7])
        dpose = jnp.concatenate([pos_err, orn_err], axis=-1)
        u = solve_ik(view.tip_jacobian, dpose)
        targets = targets.at[:, nb:-2].set(q[:, nb:-2] + u)
        targets = targets.at[:, -2:].set(q[:, -2:])
    else:
        raise NotImplementedError(cfg.drive_mode)

    lower = jnp.broadcast_to(spec.dof_lower, (E, D))
    upper = jnp.broadcast_to(spec.dof_upper, (E, D))
    return jnp.clip(targets, lower, upper)
