"""grasp_cube task: pick up a 5 cm cube and hold it at (0, 0, 0.2).

State-level-faithful rebuild of ``tasks/grasp_cube.py``:

* obs (37) = range-normalized tip pose (7) + normalized obj pos (3) +
  symmetry-canonicalized 9D obj rotation (9) + normalized qpos (9) +
  raw qvel (9)  (``grasp_cube.py:118-126``);
* reward = reach + 0.5·rot + 5·close + 20·reach-goal (+3·success)
  (``grasp_cube.py:94-100``);
* success: obj within 0.025 m of (0, 0, 0.2) while the gripper is at the obj
  (``grasp_cube.py:97-98``);
* random reset: xy ± 0.15, random yaw (``grasp_cube.py:160-167``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rotations as rot
from ..sim import contact as contact_lib
from ..sim import engine, franka, kinematics
from ..sim.types import FreeBodySpec, FreeBodyState, SimParams, TreeState
from . import base, control, vision
from .base import EnvState

RESET_RANGE = 0.15          # grasp_cube.py:17
GOAL_THRESH = 0.025         # grasp_cube.py:40
SUCCESS_POS = (0.0, 0.0, 0.2)
CUBE_HALF = 0.025           # obj z0 0.025 ⇒ 5 cm cube (grasp_cube.py:65)
CUBE_DENSITY = 1000.0       # grasp_cube.py:60


class GraspCubeEnv:
    """Batched grasp_cube environment. All step/reset methods are pure and
    jittable; this object only holds static specs."""

    def __init__(self, cfg: dict, sim_params: SimParams):
        self.cfg = cfg
        self.num_envs = cfg["num_envs"]
        self.max_episode_length = cfg["maxEpisodeLength"]
        self.explore_step = cfg["explore_step"]
        self.control_freq_inv = cfg["controlFrequencyInv"]
        self.random_reset = cfg["random_reset"]
        self.learn_input_mode = cfg.get("learn_input_mode", "normal_state")
        self.add_proprio_obs = cfg.get("add_proprio_obs", False)

        rcfg = cfg["robot"]
        mobile = "mobile" in rcfg["assetFile"]
        self.built = franka.build_franka(mobile=mobile)
        self.spheres = franka.franka_collision_spheres(self.built)
        bi = franka.franka_body_indices(self.built)
        self.ctrl = control.FrankaControlConfig(
            drive_mode=rcfg["driveMode"], mobile=mobile, dt=sim_params.dt,
            num_dofs=int(self.built.spec.dof_mask.sum()),
            lefttip_idx=bi["lefttip"], righttip_idx=bi["righttip"],
            root_quat=tuple(rcfg["root"][3:7]))
        self.num_actions = self.ctrl.num_actions

        E = self.num_envs
        m = CUBE_DENSITY * (2 * CUBE_HALF) ** 3
        cube = FreeBodySpec(
            mass=np.full(1, m, np.float32),
            inertia=(np.eye(3, dtype=np.float32)
                     * (m * (2 * CUBE_HALF) ** 2 / 6))[None],
            half_extents=np.full((1, 3), CUBE_HALF, np.float32),
            gravity_scale=np.ones(1, np.float32),
            friction=np.ones(1, np.float32),
        )
        self.scene = engine.SceneSpec(
            robot=self.built.spec, spheres=self.spheres, params=sim_params,
            free_body=cube)

        self.default_dof = np.asarray(rcfg["dof"], np.float32)
        self.default_root = np.asarray(rcfg["root"], np.float32)
        self.obj_default_root = np.array([0, 0, CUBE_HALF, 0, 0, 0, 1],
                                         np.float32)
        # pose normalization limits (grasp_cube.py:18-21)
        self.pose_lower = np.array(
            [-RESET_RANGE, -RESET_RANGE, 0.0, -1, -1, -1, -1], np.float32)
        self.pose_upper = np.array(
            [RESET_RANGE, RESET_RANGE, 0.4, 1, 1, 1, 1], np.float32)

        self.num_dofs = self.ctrl.num_dofs
        self.num_obs = dict(cfg["obs_mode"])
        self._init_vision(cfg)

    def _init_vision(self, cfg):
        """Vision rig + flattened obs sizes (≙ hand_base.py:45-54: tsdf
        modes get resolution³ dims, +proprio when add_proprio_obs)."""
        mode = self.learn_input_mode
        self.vision_rig = None
        if mode != "normal_state" and mode != "proprio_state":
            self.vision_rig = vision.VisionRig(
                cfg["cam"], cfg["obs_mode"]["tsdf"], mode,
                im_scale=cfg.get("im_scale", 1))
        if "tsdf" in mode:
            self.num_obs[mode] = int(cfg["obs_mode"]["tsdf"]["resolution"]) ** 3
        if self.add_proprio_obs and mode in self.num_obs \
                and mode != "proprio_state":
            self.num_obs[mode] += self.num_obs["proprio_state"]

    def _vision_obs(self, state, obs):
        """Append the configured vision mode to the obs dict (with proprio
        concatenation ≙ grasp_cube.py:134-137)."""
        if self.vision_rig is None:
            return obs
        v = vision.render_obs(self, self.vision_rig, state.sim)
        obs.update(v)
        if self.add_proprio_obs and "proprio_state" in obs:
            m = self.learn_input_mode
            obs[m] = jnp.concatenate([obs[m], obs["proprio_state"]], axis=-1)
        return obs

    # ------------------------------------------------------------------
    # state init / reset
    # ------------------------------------------------------------------

    def _default_sim(self, E: int) -> engine.SceneState:
        robot = TreeState(
            qpos=jnp.tile(jnp.asarray(self.default_dof), (E, 1)),
            qvel=jnp.zeros((E, self.default_dof.shape[0])),
            root_pos=jnp.tile(jnp.asarray(self.default_root[:3]), (E, 1)),
            root_quat=jnp.tile(
                jnp.asarray(self.default_root[3:7]
                            / np.linalg.norm(self.default_root[3:7])), (E, 1)))
        body = FreeBodyState(
            pos=jnp.tile(jnp.asarray(self.obj_default_root[:3]), (E, 1)),
            quat=jnp.tile(jnp.asarray(self.obj_default_root[3:7]), (E, 1)),
            linvel=jnp.zeros((E, 3)), angvel=jnp.zeros((E, 3)))
        anchors = contact_lib.init_anchors(E, self.spheres.link_idx.shape[0])
        return engine.SceneState(robot=robot, body=body, anchors=anchors)

    def _random_obj_root(self, rng, E: int):
        """Randomized cube pose (grasp_cube.py:160-167): xy ± reset_range,
        yaw via quat (0,0,sin a,cos a), a ∈ [−π, π]."""
        kxy, ka = jax.random.split(rng)
        pos = jnp.tile(jnp.asarray(self.obj_default_root[:3]), (E, 1))
        if self.random_reset:
            dxy = jax.random.uniform(kxy, (E, 2), minval=-RESET_RANGE,
                                     maxval=RESET_RANGE)
            pos = pos.at[:, :2].add(dxy)
            a = jax.random.uniform(ka, (E,), minval=-jnp.pi, maxval=jnp.pi)
            quat = jnp.stack([jnp.zeros(E), jnp.zeros(E),
                              jnp.sin(a), jnp.cos(a)], axis=-1)
        else:
            quat = jnp.tile(jnp.asarray(self.obj_default_root[3:7]), (E, 1))
        return pos, quat

    def _reset_sim_fn(self, sim: engine.SceneState, mask, rng):
        """Partial reset (≙ ``grasp_cube.reset_idx``): robot dofs and both
        roots to defaults, randomized cube pose, zero velocities."""
        E = mask.shape[0]
        fresh = self._default_sim(E)
        pos, quat = self._random_obj_root(rng, E)
        fresh = fresh._replace(body=fresh.body._replace(pos=pos, quat=quat))
        return base.mask_where(mask, fresh, sim)

    def init_state(self, rng) -> EnvState:
        E = self.num_envs
        rng, sub = jax.random.split(rng)
        st = base.init_env_state(self._default_sim(E), E, rng)
        sim = self._reset_sim_fn(st.sim, jnp.ones(E, bool), sub)
        return st._replace(sim=sim)

    def reset(self, state: EnvState) -> Tuple[EnvState, Dict]:
        """Full reset of all envs + one settling step (≙ ``hand_base.reset``,
        ``hand_base.py:394-402``)."""
        E = self.num_envs
        rng, sub = jax.random.split(state.rng)
        sim = self._reset_sim_fn(state.sim, jnp.ones(E, bool), sub)
        targets = jnp.tile(jnp.asarray(self.default_dof), (E, 1))
        sim = engine.physics_step(self.scene, sim, targets)
        state = base.init_env_state(sim, E, rng)
        obs, _ = self._observations(state)
        obs = self._vision_obs(state, obs)
        return state, obs

    # ------------------------------------------------------------------
    # observation / reward
    # ------------------------------------------------------------------

    def _robot_view(self, sim: engine.SceneState):
        fk = kinematics.forward_kinematics(self.scene.robot, sim.robot)
        return control.robot_view(self.ctrl, self.scene.robot, fk, sim.robot), fk

    def _observations(self, state: EnvState):
        view, fk = self._robot_view(state.sim)
        E = self.num_envs
        lo = jnp.asarray(self.pose_lower)
        up = jnp.asarray(self.pose_upper)
        D = self.num_dofs

        tip_pose = 2.0 * (view.tip_state[:, :7] - lo) / (up - lo) - 1.0
        obj_pos13 = state.sim.body.pos
        obj_pos = 2.0 * (obj_pos13 - lo[:3]) / (up[:3] - lo[:3]) - 1.0
        obj_rot9 = rot.deambiguity_rotation(state.sim.body.quat).reshape(E, 9)
        qn = view.qpos_normalized[:, :D]
        qv = view.qvel[:, :D]
        normal = jnp.concatenate([tip_pose, obj_pos, obj_rot9, qn, qv], -1)
        obs = {"normal_state": normal}
        if self.add_proprio_obs:
            obs["proprio_state"] = jnp.concatenate([tip_pose, qn, qv], -1)
        return obs, view

    def _reward(self, state: EnvState, view, actions):
        """≙ ``grasp_cube.compute_reward`` (grasp_cube.py:69-115)."""
        obj_pos = state.sim.body.pos
        tip = view.tip_state
        tcp_to_obj = jnp.linalg.norm(tip[:, :3] - obj_pos, axis=-1)
        is_reached = tcp_to_obj < 0.02
        reaching = -tcp_to_obj

        gl = view.gripper_length
        close_reward = (0.1 - gl) * is_reached + 0.1 * (gl - 0.1) * (~is_reached)

        obj_rot = rot.deambiguity_rotation(state.sim.body.quat)
        hand_rot = rot.quat_to_mat(tip[:, 3:7])
        down = -hand_rot[:, -1, -1]
        parallel1 = jnp.sum(
            jnp.abs(hand_rot[:, :, 0] * obj_rot[:, :, 0])
            + jnp.abs(hand_rot[:, :, 1] * obj_rot[:, :, 1]), axis=-1)
        parallel2 = jnp.sum(
            jnp.abs(hand_rot[:, :, 0] * obj_rot[:, :, 1])
            + jnp.abs(hand_rot[:, :, 1] * obj_rot[:, :, 0]), axis=-1)
        rot_reward = down + jnp.maximum(parallel1, parallel2) - 3.0

        goal = jnp.asarray(SUCCESS_POS)
        obj_to_goal = jnp.linalg.norm(obj_pos - goal[None], axis=-1)
        reaching_goal = jnp.maximum(0.2 - obj_to_goal, 0.0) * is_reached

        rew = reaching + 0.5 * rot_reward + 5.0 * close_reward + 20.0 * reaching_goal
        success = (obj_to_goal <= GOAL_THRESH) & is_reached
        rew = rew + 3.0 * success

        extras = {
            "reaching_reward": reaching,
            "close_reward": close_reward,
            "rot_reward": rot_reward,
            "is_reached": is_reached,
            "reaching_goal_reward": reaching_goal,
            "obj_movement": jnp.linalg.norm(
                obj_pos - jnp.asarray(self.obj_default_root[:3]), axis=-1),
            "raw_reward": rew,
            "obj_height": obj_pos[:, 2],
            "obj_up_flag": obj_pos[:, 2] > 0.1,
            "step_id": state.progress.astype(jnp.float32),
        }
        return rew, success, extras

    # ------------------------------------------------------------------
    # step
    def scene_pose(self, state: EnvState):
        """Per-step part poses for offline re-rendering / demo dumps
        (≙ ``compute_scene_pose``/``save_scene_pose``,
        ``hand_base.py:431-451``): rotation matrices + positions of the
        robot's mesh-bearing links plus the object part(s).  Our assets are
        primitives, so no per-mesh coordinate correction is needed (the
        reference's ``coordinate_transform_matrix``, load_robot.py:52-56)."""
        import numpy as np2
        fk = kinematics.forward_kinematics(self.scene.robot, state.sim.robot)
        li = self.built.link_index
        names = [f"panda_link{i}" for i in range(8)] + [
            "panda_hand", "panda_leftfinger", "panda_rightfinger"]
        idx = jnp.asarray(np2.array([[li[n] for n in names]]))
        idx = jnp.broadcast_to(idx, (self.num_envs, len(names)))
        rpos = kinematics._take_env(fk.link_pos, idx)
        rq = kinematics._take_env(fk.link_quat, idx)
        rrot = rot.quat_to_mat(rq)
        orot = rot.quat_to_mat(state.sim.body.quat)
        opos = state.sim.body.pos
        return {"rot": jnp.concatenate([rrot, orot[:, None]], axis=1),
                "pos": jnp.concatenate([rpos, opos[:, None]], axis=1)}

    # ------------------------------------------------------------------

    def step(self, state: EnvState, actions, train: bool = True,
             force_reset=None):
        """One env step. Returns (state', obs_dict, rew, reset, extras)."""
        E = self.num_envs
        view, _ = self._robot_view(state.sim)
        targets = control.compute_targets(self.ctrl, self.scene.robot, view,
                                          actions)
        default_targets = jnp.tile(jnp.asarray(self.default_dof), (E, 1))
        state, final_targets, pre_extras = base.pre_physics(
            state, targets, default_targets, self._reset_sim_fn,
            self.explore_step, self.max_episode_length, train,
            force_reset=force_reset)

        sim = base.run_physics(self.scene, state.sim, final_targets,
                               self.control_freq_inv)
        state = state._replace(sim=sim, progress=state.progress + 1)

        obs, view = self._observations(state)
        obs = self._vision_obs(state, obs)
        rew, success, extras = self._reward(state, view, actions)
        extras.update(pre_extras)
        state = state._replace(rew_buf=rew, success=success)
        return state, obs, rew, state.reset_buf, extras
