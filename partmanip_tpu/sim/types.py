"""Simulator state & specification pytrees.

The TPU-native replacement for Isaac Gym's stateful sim object
(``tasks/hand_base.py:80-85``, ``:404-411``): all simulation state lives in
explicit pytrees of ``[num_envs, ...]`` arrays that thread functionally
through a jitted step.  The gymtorch zero-copy alias trick becomes buffer
donation of these pytrees.

Two kinds of simulated entities:

* ``Tree`` — a fixed-base articulation (the Franka, GAPartNet cabinets).
  Reduced coordinates ``qpos/qvel`` of size D; links padded to L with masks
  so heterogeneous per-env objects batch rectangularly (the TPU analog of
  the reference's ragged gather masks, ``tasks/open_drawer.py:58-73``).
* ``FreeBody`` — a lone free rigid body (the cube), integrated with
  Newton-Euler directly; no articulation machinery needed.

All ``TreeSpec`` arrays carry a leading env axis that may be 1 (broadcast —
the robot is identical across envs) or ``num_envs`` (per-env objects).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array


# Joint type codes (branchless blending in kinematics keys off these).
JOINT_FIXED = 0
JOINT_REVOLUTE = 1
JOINT_PRISMATIC = 2


class TreeSpec(NamedTuple):
    """Static description of a fixed-base articulation, padded to (L, D).

    Topology arrays may differ per env but must satisfy ``parent[e, l] < l``
    (topological order) so kinematics can sweep links once, in index order.
    """

    # --- per link, [E?, L] / [E?, L, k] ---
    parent: Array        # i32; parent link index, -1 for the root link
    joint_type: Array    # i32; JOINT_* code of the joint connecting to parent
    origin_pos: Array    # f32 [E?, L, 3]; joint frame origin in parent frame
    origin_quat: Array   # f32 [E?, L, 4]; joint frame rotation in parent frame
    axis: Array          # f32 [E?, L, 3]; joint axis in the child/joint frame
    dof_idx: Array       # i32; dof driving this link (valid iff joint_type>0)
    link_mask: Array     # f32; 1.0 for real links, 0.0 for padding
    mass: Array          # f32 [E?, L]
    com: Array           # f32 [E?, L, 3]; center of mass in link frame
    inertia: Array       # f32 [E?, L, 3, 3]; about com, in link frame

    # --- per dof, [E?, D] ---
    dof_child: Array     # i32; link whose joint this dof actuates
    dof_mask: Array      # f32; 1.0 for real dofs
    dof_lower: Array
    dof_upper: Array
    dof_vel_limit: Array
    dof_effort: Array    # drive force/torque limit
    dof_armature: Array
    dof_damping: Array   # intrinsic joint damping (not the drive's)
    dof_friction: Array  # Coulomb joint friction
    drive_kp: Array      # PD position-drive stiffness (0 = undriven)
    drive_kd: Array      # PD position-drive damping

    # --- misc ---
    ancestor: Array      # f32 [E?, L, D]; 1.0 iff dof d moves link l
    gravity_scale: Array  # f32 [E?]; 0.0 ≙ Isaac asset disable_gravity

    @property
    def num_links(self) -> int:
        return self.parent.shape[-1]

    @property
    def num_dofs(self) -> int:
        return self.dof_mask.shape[-1]


class TreeState(NamedTuple):
    """Dynamic state of a fixed-base articulation, [E, ...]."""

    qpos: Array       # f32 [E, D]
    qvel: Array       # f32 [E, D]
    root_pos: Array   # f32 [E, 3]; world pose of the root link
    root_quat: Array  # f32 [E, 4]


class FreeBodySpec(NamedTuple):
    """A single free rigid body (box collision geometry)."""

    mass: Array          # f32 [E?]
    inertia: Array       # f32 [E?, 3, 3] about com, body frame
    half_extents: Array  # f32 [E?, 3] collision box half sizes
    gravity_scale: Array  # f32 [E?]
    friction: Array      # f32 [E?]


class FreeBodyState(NamedTuple):
    pos: Array      # f32 [E, 3]
    quat: Array     # f32 [E, 4] xyzw
    linvel: Array   # f32 [E, 3]
    angvel: Array   # f32 [E, 3] world frame


class SphereGeoms(NamedTuple):
    """Collision spheres attached to articulation links (robot side)."""

    link_idx: Array  # i32 [S]
    offset: Array    # f32 [S, 3] center in link frame
    radius: Array    # f32 [S]
    friction: Array  # f32 [S]
    sticky: Array    # f32 [S] 1.0 = stick-slip anchor friction (finger pads)


class BoxGeoms(NamedTuple):
    """Collision boxes attached to articulation links (object side)."""

    link_idx: Array   # i32 [E?, G]
    offset_pos: Array   # f32 [E?, G, 3]
    offset_quat: Array  # f32 [E?, G, 4]
    half_extents: Array  # f32 [E?, G, 3]
    geom_mask: Array    # f32 [E?, G]
    friction: Array     # f32 [E?, G]


class GridGeoms(NamedTuple):
    """Baked mesh-SDF collision geoms attached to articulation links
    (≙ PhysX SDF-mode mesh collision, ``<sdf resolution>`` in the reference
    URDFs).  The grids themselves live in a shared ``ops.sdf.GridStack``
    (SceneSpec.grid_stack); each geom references one by index."""

    link_idx: Array     # i32 [E?, K]
    grid_id: Array      # i32 [E?, K] index into the scene GridStack
    offset_pos: Array   # f32 [E?, K, 3] grid frame in link frame
    offset_quat: Array  # f32 [E?, K, 4]
    geom_mask: Array    # f32 [E?, K]
    friction: Array     # f32 [E?, K]


class SimParams(NamedTuple):
    """Global integration parameters (≙ the reference's PhysX ``SimParams``
    block, ``utils/config.py:9-33`` / ``cfg/base_cfg.yaml:31-45``)."""

    dt: float = 1.0 / 60.0       # control-rate timestep
    substeps: int = 4            # ≙ sim.substeps
    inner_substeps: int = 4      # extra subdivision for contact stability
    gravity: float = -9.81
    contact_kn: float = 2.0e4    # penalty normal stiffness [N/m]
    contact_damping_ratio: float = 1.0
    contact_kt: float = 1.0e3    # tangential (friction) damping [N·s/m]
    contact_offset: float = 0.005  # activation distance (physx contact_offset)
    max_depenetration_velocity: float = 1.0  # ≙ physx, cfg/base_cfg.yaml:42
    # Velocity-product (Coriolis/centrifugal) terms. Negligible against the
    # 1e3 joint damping + PD drives of the PartManip scenes; the analytic
    # term stays available for generic articulations.
    coriolis: bool = True
    # Run the inner step on the fused Pallas kernel when the scene supports
    # it (see sim/fused.py docstring for the fallback conditions).
    use_fused: bool = True

    @property
    def h(self) -> float:
        """Inner integration step."""
        return self.dt / (self.substeps * self.inner_substeps)


class FK(NamedTuple):
    """Forward-kinematics result for one articulation."""

    link_pos: Array    # f32 [E, L, 3]
    link_quat: Array   # f32 [E, L, 4]
    # Per-dof world quantities (gathered from the dof's child link):
    dof_axis_w: Array    # f32 [E, D, 3] joint axis in world
    dof_anchor_w: Array  # f32 [E, D, 3] a point on the joint axis (world)
