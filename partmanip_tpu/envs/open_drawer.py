"""open_drawer task: grasp a cabinet handle and pull the drawer ≥50 % open.

State-level-faithful rebuild of ``tasks/open_drawer.py`` on the padded
heterogeneous-object machinery:

* GAPartNet-layout asset dirs (procedurally generated if absent) are parsed
  and padded to rectangular [n_objs, L/D/G] spec arrays, then gathered per
  env (``env_id % n_objs``, ``open_drawer.py:145``) — replacing the ragged
  ``dof_state_mask`` gather trick (``open_drawer.py:58-73``);
* handle-bbox forward kinematics each step:
  ``bbox = (bbox_init + q·axis_dir) Rᵀ + t`` (``open_drawer.py:258-259``);
* the **part-aware reward** (``open_drawer.py:170-248``): reach-into-bbox
  tests on the three handle axes, grip-alignment dot products, close reward,
  grasp-gated joint-opening reward capped at ``suc_prop = 0.5``,
  multiplicative rotation shaping ``rew += |rew|·rot``, +2 on success;
* success = grasped ∧ joint ≥ 50 % open (``open_drawer.py:227``), with the
  persistent per-object success bitmap (``succ_objid_lst``, ``:229-232``);
* obs (53) = tip body row (13) + handle mid (3) + out/short/long units (9) +
  lengths (3) + qpos_norm (12) + qvel (12) + drawer qpos (1)
  (``open_drawer.py:277-284``);
* random reset ±0.05 m xyz, yaw quat (sin a, cos a) with a ∈ ±π/12
  (``open_drawer.py:312-318``).

Every cabinet joint is simulated (the reference sets DOF props for all
object dofs, ``open_drawer.py:162-167``); only the per-env target dof
feeds reward/obs, selected by joint name from the asset dir encoding.
"""

from __future__ import annotations

import random as pyrandom
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rotations as rot
from ..sim import builder, contact as contact_lib
from ..sim import engine, franka, kinematics
from ..sim.types import BoxGeoms, SimParams, TreeState
from . import assets, base, control, vision
from .base import EnvState

SUC_PROP = 0.5              # open_drawer.py:84
OBJ_DEFAULT_ROOT = np.array([-0.6, 0, 0.5, 0, 0, 1, 0], np.float32)  # :44
RESET_T_RANGE = 0.05        # :46
RESET_R_RANGE = np.pi / 12  # :47


class OpenDrawerEnv:
    def __init__(self, cfg: dict, sim_params: SimParams):
        self.cfg = cfg
        self.num_envs = cfg["num_envs"]
        self.max_episode_length = cfg["maxEpisodeLength"]
        self.explore_step = cfg["explore_step"]
        self.control_freq_inv = cfg["controlFrequencyInv"]
        self.random_reset = cfg["random_reset"]
        self.learn_input_mode = cfg.get("learn_input_mode", "normal_state")
        self.add_proprio_obs = cfg.get("add_proprio_obs", False)
        self.obj_scale = cfg["asset"].get("obj_scale", 0.5)  # open_drawer.py:31

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
        self.num_dofs = self.ctrl.num_dofs

        # ---- objects: scan split dir, shuffle, load padded ----
        split = cfg["asset"]["splits"]
        n_obj = cfg["asset"].get("num_objects", 16)
        dirs = assets.ensure_drawer_assets(
            cfg["asset"]["assetRoot"], split, n_obj,
            mesh_handle=cfg["asset"].get("mesh_handle", False))
        pyrandom.shuffle(dirs)  # ≙ open_drawer.py:37
        objs = []
        max_links = max_dofs = max_boxes = 0
        for d in dirs:
            p = assets.parse_urdf(f"{d}/mobility_new.urdf")
            max_links = max(max_links, len(p.links))
            max_dofs = max(max_dofs, max(len(p.dof_names), 1))
            max_boxes = max(max_boxes, len(p.boxes))
        for d in dirs:
            objs.append(assets.load_drawer_object(
                d, self.obj_scale, pad_links=max_links, pad_dofs=max_dofs,
                max_boxes=max_boxes))
        self.objs = objs
        self.num_objects = len(objs)

        E = self.num_envs
        obj_ids = np.arange(E) % self.num_objects  # ≙ open_drawer.py:145
        self.obj_lstid = obj_ids

        obj_spec = builder.stack_trees([o.built.spec for o in objs])
        self.obj_spec_full = obj_spec
        gather = lambda arr: np.asarray(arr)[obj_ids]
        obj_spec_env = jax.tree.map(gather, obj_spec)
        # The reference overrides every object dof's drive properties at
        # load time — stiffness 0, damping 20, friction 5, DOF_MODE_NONE
        # (open_drawer.py:162-167) — so asset URDF values are ignored there.
        # Do the same; null in the cfg keeps the URDF values (randomized-
        # dynamics experiments).
        dmp = cfg["asset"].get("objDofDamping", 20.0)
        frc = cfg["asset"].get("objDofFriction", 5.0)
        if dmp is not None:
            obj_spec_env = obj_spec_env._replace(dof_damping=np.full_like(
                np.asarray(obj_spec_env.dof_damping), dmp))
        if frc is not None:
            obj_spec_env = obj_spec_env._replace(dof_friction=np.full_like(
                np.asarray(obj_spec_env.dof_friction), frc))
        boxes = BoxGeoms(
            link_idx=np.stack([o.boxes_link_idx for o in objs])[obj_ids],
            offset_pos=np.stack([o.boxes_pos for o in objs])[obj_ids],
            offset_quat=np.stack([o.boxes_quat for o in objs])[obj_ids],
            half_extents=np.stack([o.boxes_half for o in objs])[obj_ids],
            geom_mask=np.stack([o.boxes_mask for o in objs])[obj_ids],
            friction=np.ones((E, max_boxes), np.float32),
        )
        # mesh-SDF collision geoms (real GAPartNet assets carry mesh geoms;
        # procedural assets are box-only and leave this None → fused kernel)
        obj_grids = grid_stack = None
        max_K = max((len(o.grids_link_idx) for o in objs), default=0)
        if max_K > 0:
            from ..ops import sdf as sdf_ops
            from ..sim.types import GridGeoms
            grid_dicts = []
            n_obj = len(objs)
            glink = np.zeros((n_obj, max_K), np.int32)
            ggid = np.zeros((n_obj, max_K), np.int32)
            gpos = np.zeros((n_obj, max_K, 3), np.float32)
            gquat = np.tile(np.array([0, 0, 0, 1], np.float32),
                            (n_obj, max_K, 1))
            gmask = np.zeros((n_obj, max_K), np.float32)
            for i, o in enumerate(objs):
                for k in range(len(o.grids_link_idx)):
                    glink[i, k] = o.grids_link_idx[k]
                    ggid[i, k] = len(grid_dicts)
                    grid_dicts.append(o.grid_dicts[k])
                    gpos[i, k] = o.grids_pos[k]
                    gquat[i, k] = o.grids_quat[k]
                    gmask[i, k] = 1.0
            trunc = 6.0 * max(g["voxel_size"] for g in grid_dicts)
            grid_stack = sdf_ops.stack_grids(grid_dicts, pad_value=trunc)
            obj_grids = GridGeoms(
                link_idx=glink[obj_ids], grid_id=ggid[obj_ids],
                offset_pos=gpos[obj_ids], offset_quat=gquat[obj_ids],
                geom_mask=gmask[obj_ids],
                friction=np.ones((E, max_K), np.float32))

        self.scene = engine.SceneSpec(
            robot=self.built.spec, spheres=self.spheres, params=sim_params,
            obj_tree=obj_spec_env, obj_boxes=boxes,
            obj_grids=obj_grids, grid_stack=grid_stack)

        # per-env part annotations (≙ the stacked init tensors, :76-81)
        self.part_bbox_init = np.stack([o.handle_bbox for o in objs])[obj_ids]
        self.part_axis_dir = np.stack([o.axis_dir for o in objs])[obj_ids]
        self.target_dof = np.stack(
            [np.int32(o.target_dof) for o in objs])[obj_ids]
        self.joint_lower = np.stack(
            [np.float32(o.joint_lower) for o in objs])[obj_ids]
        self.joint_upper = np.stack(
            [np.float32(o.joint_upper) for o in objs])[obj_ids]

        self.default_dof = np.asarray(rcfg["dof"], np.float32)
        self.default_root = np.asarray(rcfg["root"], np.float32)
        self.num_obs = dict(cfg["obs_mode"])
        self._init_vision(cfg)

    def _init_vision(self, cfg):
        """Vision rig + flattened obs sizes (≙ hand_base.py:45-54)."""
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
        if self.vision_rig is None:
            return obs
        v = vision.render_obs(self, self.vision_rig, state.sim)
        obs.update(v)
        if self.add_proprio_obs and "proprio_state" in obs:
            m = self.learn_input_mode
            obs[m] = jnp.concatenate([obs[m], obs["proprio_state"]], axis=-1)
        return obs

    # ------------------------------------------------------------------

    def _default_sim(self, E: int) -> engine.SceneState:
        D_obj = self.scene.obj_tree.dof_mask.shape[-1]
        robot = TreeState(
            qpos=jnp.tile(jnp.asarray(self.default_dof), (E, 1)),
            qvel=jnp.zeros((E, self.default_dof.shape[0])),
            root_pos=jnp.tile(jnp.asarray(self.default_root[:3]), (E, 1)),
            root_quat=jnp.tile(
                jnp.asarray(self.default_root[3:7]
                            / np.linalg.norm(self.default_root[3:7])), (E, 1)))
        lower = jnp.asarray(self.scene.obj_tree.dof_lower)
        obj = TreeState(
            qpos=jnp.broadcast_to(lower, (E, D_obj)) * 1.0,
            qvel=jnp.zeros((E, D_obj)),
            root_pos=jnp.tile(jnp.asarray(OBJ_DEFAULT_ROOT[:3]), (E, 1)),
            root_quat=jnp.tile(jnp.asarray(OBJ_DEFAULT_ROOT[3:7]), (E, 1)))
        anchors = contact_lib.init_anchors(E, self.spheres.link_idx.shape[0])
        return engine.SceneState(robot=robot, obj=obj, anchors=anchors)

    def _random_obj_root(self, rng, E: int):
        """≙ open_drawer.reset_idx randomization (:312-318)."""
        kxyz, ka = jax.random.split(rng)
        pos = jnp.tile(jnp.asarray(OBJ_DEFAULT_ROOT[:3]), (E, 1))
        quat0 = jnp.asarray(OBJ_DEFAULT_ROOT[3:7])
        if self.random_reset:
            pos = pos + jax.random.uniform(
                kxyz, (E, 3), minval=-RESET_T_RANGE, maxval=RESET_T_RANGE)
            a = jax.random.uniform(ka, (E,), minval=-RESET_R_RANGE,
                                   maxval=RESET_R_RANGE)
            dq = jnp.stack([jnp.zeros(E), jnp.zeros(E),
                            jnp.sin(a), jnp.cos(a)], axis=-1)
            quat = rot.quat_mul(jnp.broadcast_to(quat0, (E, 4)), dq)
        else:
            quat = jnp.broadcast_to(quat0, (E, 4))
        return pos, quat

    def _reset_sim_fn(self, sim, mask, rng):
        E = mask.shape[0]
        fresh = self._default_sim(E)
        pos, quat = self._random_obj_root(rng, E)
        fresh = fresh._replace(obj=fresh.obj._replace(root_pos=pos,
                                                      root_quat=quat))
        return base.mask_where(mask, fresh, sim)

    def init_state(self, rng) -> EnvState:
        E = self.num_envs
        rng, sub = jax.random.split(rng)
        st = base.init_env_state(self._default_sim(E), E, rng)
        st = st._replace(
            sim=self._reset_sim_fn(st.sim, jnp.ones(E, bool), sub),
            task_state=jnp.zeros(self.num_objects, bool))  # succ_objid_lst
        return st

    def reset(self, state: EnvState) -> Tuple[EnvState, Dict]:
        E = self.num_envs
        rng, sub = jax.random.split(state.rng)
        sim = self._reset_sim_fn(state.sim, jnp.ones(E, bool), sub)
        targets = jnp.tile(jnp.asarray(self.default_dof), (E, 1))
        sim = engine.physics_step(self.scene, sim, targets)
        st = base.init_env_state(sim, E, rng)
        st = st._replace(task_state=state.task_state)
        obs, _, _ = self._observations(st)
        obs = self._vision_obs(st, obs)
        return st, obs

    # ------------------------------------------------------------------

    def _robot_view(self, sim):
        fk = kinematics.forward_kinematics(self.scene.robot, sim.robot)
        return control.robot_view(self.ctrl, self.scene.robot, fk, sim.robot), fk

    def _target_qpos(self, sim):
        """The target drawer joint position per env [E]."""
        td = jnp.asarray(self.target_dof)
        return jnp.take_along_axis(sim.obj.qpos, td[:, None], axis=1)[:, 0]

    def _part_bbox(self, sim):
        """Handle bbox world FK (≙ open_drawer.py:258-259)."""
        q = self._target_qpos(sim)
        bbox0 = jnp.asarray(self.part_bbox_init)          # [E, 8, 3]
        axis = jnp.asarray(self.part_axis_dir)            # [E, 3]
        objc = bbox0 + q[:, None, None] * axis[:, None, :]
        R = rot.quat_to_mat(sim.obj.root_quat)            # [E, 3, 3]
        return (jnp.einsum("eca,eba->ecb", objc, R)
                + sim.obj.root_pos[:, None, :])

    @staticmethod
    def _handle_axes(part_bbox):
        out = part_bbox[:, 0] - part_bbox[:, 4]
        long = part_bbox[:, 1] - part_bbox[:, 0]
        short = part_bbox[:, 3] - part_bbox[:, 0]
        mid = (part_bbox[:, 0] + part_bbox[:, 6]) / 2
        ol = jnp.linalg.norm(out, axis=-1)
        ll = jnp.linalg.norm(long, axis=-1)
        sl = jnp.linalg.norm(short, axis=-1)
        return (out / ol[:, None], long / ll[:, None], short / sl[:, None],
                mid, ol, ll, sl)

    def _observations(self, state: EnvState):
        view, fk = self._robot_view(state.sim)
        E = self.num_envs
        part_bbox = self._part_bbox(state.sim)
        out, long, short, mid, ol, ll, sl = self._handle_axes(part_bbox)
        q_target = self._target_qpos(state.sim)
        D = self.num_dofs
        normal = jnp.concatenate([
            view.tip_state,                       # 13
            mid,                                  # 3
            out, short, long,                     # 9
            ol[:, None], ll[:, None], sl[:, None],  # 3
            view.qpos_normalized[:, :D],          # 12
            view.qvel[:, :D],                     # 12
            q_target[:, None],                    # 1  → 53
        ], axis=-1)
        obs = {"normal_state": normal}
        return obs, view, part_bbox

    def _reward(self, state: EnvState, view, part_bbox, actions):
        """≙ open_drawer.compute_reward (open_drawer.py:170-248)."""
        out, long, short, mid, ol, ll, sl = self._handle_axes(part_bbox)
        handle_shortest = jnp.minimum(jnp.minimum(ol, ll), sl)

        tip = view.tip_state
        d = tip[:, :3] - mid
        dist = jnp.linalg.norm(d, axis=-1)
        is_reached_out = jnp.abs(jnp.sum(d * out, -1)) < ol / 2
        short_l = jnp.sum((view.ltip_state[:, :3] - mid) * short, -1)
        short_r = jnp.sum((view.rtip_state[:, :3] - mid) * short, -1)
        is_reached_short = (short_l * short_r) < 0
        is_reached_long = jnp.abs(jnp.sum(d * long, -1)) < ll / 2
        is_reached = is_reached_out & is_reached_short & is_reached_long
        reaching = -dist + 0.1 * (is_reached_out.astype(jnp.float32)
                                  + is_reached_short + is_reached_long)

        hq = tip[:, 3:7]
        grip_dir = rot.quat_axis(hq, 2)
        sep_dir = rot.quat_axis(hq, 1)
        down_dir = rot.quat_axis(hq, 0)
        dot1 = jnp.sum(-grip_dir * out, -1)
        dot2 = jnp.maximum(jnp.sum(sep_dir * short, -1),
                           jnp.sum(-sep_dir * short, -1))
        dot3 = jnp.maximum(jnp.sum(down_dir * long, -1),
                           jnp.sum(-down_dir * long, -1))
        rot_reward = dot1 + dot2 + dot3 - 3.0

        gl = view.gripper_length
        close_reward = (0.1 - gl) * is_reached + 0.1 * (gl - 0.1) * (~is_reached)

        grasp_success = (is_reached & (gl < sl + 0.01) & (rot_reward > -0.2))

        q = self._target_qpos(state.sim)
        lower = jnp.asarray(self.joint_lower)
        upper = jnp.asarray(self.joint_upper)
        open_frac = (q - lower) / upper
        joint_state_reward = grasp_success * (
            0.1 + jnp.clip(open_frac, max=SUC_PROP))
        is_open = grasp_success & (open_frac > 0.1)
        is_open_notgrasp = open_frac > 0.1

        rew = (reaching + 0.5 * rot_reward + 5.0 * close_reward
               + 5.0 * joint_state_reward)
        rew = rew + jnp.abs(rew) * rot_reward   # multiplicative shaping :216

        success = grasp_success & ((q - lower) >= SUC_PROP * upper)
        succ_objid = state.task_state
        obj_ids = jnp.asarray(self.obj_lstid)
        succ_objid = succ_objid.at[obj_ids].max(success)
        rew = rew + 2.0 * success

        extras = {
            "is_open": is_open,
            "is_open_notgrasp": is_open_notgrasp,
            "reaching_reward": reaching,
            "close_reward": close_reward,
            "rot_reward": rot_reward,
            "is_reached": is_reached,
            "joint_state_reward": joint_state_reward,
            "raw_reward": rew,
            "is_grasped": grasp_success.astype(jnp.float32),
            "success_objnum": succ_objid,
            "step_id": state.progress.astype(jnp.float32),
            "open_frac": open_frac,
        }
        return rew, success, succ_objid, extras

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
        orot = rot.quat_to_mat(state.sim.obj.root_quat)
        opos = state.sim.obj.root_pos
        return {"rot": jnp.concatenate([rrot, orot[:, None]], axis=1),
                "pos": jnp.concatenate([rpos, opos[:, None]], axis=1)}

    # ------------------------------------------------------------------

    def step(self, state: EnvState, actions, train: bool = True,
             force_reset=None):
        E = self.num_envs
        view, _ = self._robot_view(state.sim)
        targets = control.compute_targets(self.ctrl, self.scene.robot, view,
                                          actions)
        default_targets = jnp.tile(jnp.asarray(self.default_dof), (E, 1))
        task_state = state.task_state
        state, final_targets, pre_extras = base.pre_physics(
            state, targets, default_targets, self._reset_sim_fn,
            self.explore_step, self.max_episode_length, train,
            force_reset=force_reset)

        sim = base.run_physics(self.scene, state.sim, final_targets,
                               self.control_freq_inv)
        state = state._replace(sim=sim, progress=state.progress + 1,
                               task_state=task_state)

        obs, view, part_bbox = self._observations(state)
        obs = self._vision_obs(state, obs)
        rew, success, succ_objid, extras = self._reward(
            state, view, part_bbox, actions)
        extras.update(pre_extras)
        state = state._replace(rew_buf=rew, success=success,
                               task_state=succ_objid)
        return state, obs, rew, state.reset_buf, extras
