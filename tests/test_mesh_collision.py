"""Mesh-geometry collision: baked SDF grids in the contact engine
(≙ PhysX SDF-mode mesh collision, the reference's real GAPartNet asset path:
``franka_panda_sdf_mobile.urdf:231``, ``tasks/open_drawer.py:121-123``)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partmanip_tpu import config
from partmanip_tpu.envs import assets
from partmanip_tpu.ops import sdf as sdf_ops
from partmanip_tpu.sim import engine

ROOT = "/tmp/partmanip_assets_mesh"


class TestBakeAndQuery:
    def test_box_mesh_sdf_matches_analytic(self, tmp_path):
        """Bake a box .obj; grid_query_grad must reproduce the analytic box
        SDF to within a voxel, with outward gradients."""
        size = (0.2, 0.1, 0.06)
        path = str(tmp_path / "box.obj")
        assets._write_box_obj(path, size)
        verts, faces = assets.load_obj_mesh(path)
        assert verts.shape == (8, 3) and faces.shape == (12, 3)

        grid = sdf_ops.bake_mesh_sdf(verts, faces, voxel_size=0.005,
                                     trunc=0.03)
        stack = sdf_ops.stack_grids([grid], pad_value=0.03)

        rng = np.random.RandomState(0)
        pts = rng.uniform(-0.14, 0.14, (64, 3)).astype(np.float32)
        gid = jnp.zeros((64,), jnp.int32)
        val, grad = sdf_ops.grid_query_grad(stack, gid, jnp.asarray(pts),
                                            outside_value=0.03)
        half = np.asarray(size) / 2
        q = np.abs(pts) - half
        d_out = np.linalg.norm(np.maximum(q, 0), axis=-1)
        d_in = np.minimum(q.max(-1), 0)
        ref = np.clip(d_out + d_in, -0.03, 0.03)
        inside_grid = np.asarray(val) < 0.029
        err = np.abs(np.asarray(val) - ref)[inside_grid]
        # trilinear interpolation across the edge/corner distance kinks is
        # accurate to ~2 voxels; faces are sub-voxel
        assert err.max() < 0.011, err.max()
        # outside the surface the SDF is smooth: |∇| ≈ 1 and outward
        near_out = (ref > 0.004) & (ref < 0.02)
        g = np.asarray(grad)[near_out]
        assert (np.abs(np.linalg.norm(g, axis=-1) - 1.0) < 0.15).all()
        # inside, the direction must still point outward (the magnitude
        # legitimately flattens near the medial axis of thin geometry)
        pen = ref < -0.004
        g_in = np.asarray(grad)[pen]
        outward = (g_in * np.sign(pts[pen])).max(-1)
        assert (outward > 0).all()


def _mesh_env(n_envs=2):
    split_dir = os.path.join(ROOT, "objs", "drawer", "train")
    os.makedirs(split_dir, exist_ok=True)
    dirs = [d for d in os.listdir(split_dir)
            if os.path.isdir(os.path.join(split_dir, d))]
    if not dirs:
        assets.generate_drawer_asset(split_dir, "train", 0, mesh_handle=True)
    from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
    cfg, sp = config.process_cfgs(
        ["--taskcfg", "open_drawer", "--algo.num_envs", str(n_envs),
         "--sim.inner_substeps", "1",
         "--task.asset.num_objects", "1",
         "--task.asset.assetRoot", ROOT])
    return OpenDrawerEnv(cfg["task"], sp), sp


class TestMeshHandleAsset:
    def test_ensure_assets_mesh_split(self, tmp_path):
        """ensure_drawer_assets(mesh_handle=True) generates into a separate
        <split>_mesh dir with mesh handle geoms (the bench --mesh path)."""
        dirs = assets.ensure_drawer_assets(str(tmp_path), "train", 1,
                                           mesh_handle=True)
        assert len(dirs) == 1 and os.sep + "train_mesh" + os.sep in dirs[0]
        p = assets.parse_urdf(os.path.join(dirs[0], "mobility_new.urdf"))
        assert len(p.meshes) > 0        # handles emitted as mesh geoms
        # box split untouched / independent
        dirs_box = assets.ensure_drawer_assets(str(tmp_path), "train", 1)
        p2 = assets.parse_urdf(os.path.join(dirs_box[0],
                                            "mobility_new.urdf"))
        assert len(p2.meshes) == 0

    def test_parse_and_bake(self):
        env, sp = _mesh_env()
        assert env.scene.obj_grids is not None
        assert env.scene.grid_stack is not None
        assert float(np.asarray(env.scene.obj_grids.geom_mask).max()) == 1.0
        # the grid cache landed next to the mesh
        split_dir = os.path.join(ROOT, "objs", "drawer", "train")
        dirs = sorted(d for d in os.listdir(split_dir)
                      if os.path.isdir(os.path.join(split_dir, d)))
        d = os.path.join(split_dir, dirs[0])
        assert any(".sdf_" in f for f in os.listdir(d)), os.listdir(d)

    def test_handle_contact_pulls_drawer(self):
        """Teleport the cabinet so its mesh handle encloses a finger-pad
        sphere: the penalty contact must push the drawer dof and react on
        the robot; a far-away cabinet must produce no object motion."""
        from partmanip_tpu.ops import rotations as rot
        from partmanip_tpu.sim import contact as contact_lib
        from partmanip_tpu.sim import kinematics

        env, sp = _mesh_env()
        E = env.num_envs
        # This test measures contact *coupling*, not drive-through-friction:
        # the env now fixes drawer-dof friction 5 / damping 20 (reference
        # load-time override), which would swallow the gentle pad touch.
        ot = env.scene.obj_tree
        env.scene = env.scene._replace(obj_tree=ot._replace(
            dof_friction=jnp.zeros_like(jnp.asarray(ot.dof_friction)),
            dof_damping=jnp.ones_like(jnp.asarray(ot.dof_damping))))
        state = env.init_state(jax.random.PRNGKey(0))
        sim = state.sim

        # world position of one sticky finger-pad sphere at the default qpos
        fk = kinematics.forward_kinematics(env.scene.robot, sim.robot)
        centers = contact_lib.sphere_positions(
            env.scene.robot, fk, env.spheres, E)
        pad = int(np.nonzero(np.asarray(env.spheres.sticky))[0][0])
        pad_pos = np.asarray(centers)[:, pad]                    # [E, 3]

        # handle mid in object-local coordinates (drawer closed)
        bbox0 = np.asarray(env.part_bbox_init)                   # [E, 8, 3]
        mid_local = 0.5 * (bbox0[:, 0] + bbox0[:, 6])
        rq = np.asarray(sim.obj.root_quat)
        R = np.asarray(rot.quat_to_mat(jnp.asarray(rq)))
        # hook the pad just behind the bar's BACK face (local +x, toward the
        # panel): the SDF gradient there is along the drawer axis, so the
        # reaction PULLS the prismatic dof open.  At the bar CENTER the
        # gradient points along the short axis (medial surface) and the dof
        # feels ~nothing for thin bars; at the front face the push is into
        # the closed joint limit, which clamps qvel to 0.
        ho = 0.5 * (bbox0[:, :, 0].max(1) - bbox0[:, :, 0].min(1))  # [E]
        r = float(np.asarray(env.spheres.radius)[pad])
        off = np.zeros_like(mid_local)
        off[:, 0] = ho + 0.2 * r           # sphere overlaps face by 0.8 r
        root_pos = pad_pos - np.einsum("eab,eb->ea", R, mid_local + off)

        sim_touch = sim._replace(obj=sim.obj._replace(
            root_pos=jnp.asarray(root_pos)))
        targets = jnp.tile(jnp.asarray(env.default_dof), (E, 1))
        step = jax.jit(lambda s: engine.physics_step(env.scene, s, targets))
        out = step(sim_touch)
        td = np.asarray(env.target_dof)
        qv = np.asarray(out.obj.qvel)[np.arange(E), td]
        assert np.isfinite(np.asarray(out.robot.qpos)).all()
        assert (np.abs(qv) > 1e-4).all(), qv       # drawer felt the contact

        # control: cabinet far away → no object motion
        far = sim._replace(obj=sim.obj._replace(
            root_pos=jnp.asarray(root_pos + np.array([0, 0, 10.0],
                                                     np.float32))))
        out2 = step(far)
        qv2 = np.asarray(out2.obj.qvel)[np.arange(E), td]
        assert (np.abs(qv2) < 1e-6).all(), qv2

    def test_env_steps_finite(self):
        env, sp = _mesh_env()
        state = env.init_state(jax.random.PRNGKey(1))
        state, obs = jax.jit(env.reset)(state)
        step = jax.jit(lambda s, a: env.step(s, a, train=True))
        a = jnp.zeros((env.num_envs, env.num_actions))
        for _ in range(3):
            state, obs, rew, reset, extras = step(state, a)
        assert np.isfinite(np.asarray(obs["normal_state"])).all()
        assert np.isfinite(np.asarray(rew)).all()
