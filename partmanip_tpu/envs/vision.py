"""Vision observation rig shared by the tasks.

≙ the reference's camera/observation plumbing (``hand_base.load_camera``
``:161-246`` + ``render`` ``:292-361``): a hemisphere rig (3 views 512×288
for volumetric modes; 1 view 128×72 for image modes), SDF-raymarched depth,
and the derived observation modes:

* ``depth_tsdf``  — multi-view TSDF fusion → res³ volume;
* ``depth_pc``    — unproject + workspace crop + FPS-1024 → 3072;
* ``depth_sparse``— near-surface voxel FPS → [1024, 4] → 4096;
* ``depth_img``   — raw single-view depth 72×128 → 9216;
* ``rgb_img``     — Lambertian-shaded per-segment-albedo RGB render
  (≙ Isaac's RGB camera on the untextured URDF scene;
  ``raymarch.render_rgb`` — analytic normals + albedo palette) → 27648;
* ``mesh_tsdf``   — ground-truth scene TSDF sampled analytically from the
  simulation's own collision primitives (≙ ``TSDFfromMesh.query_tsdf``,
  ``utils/mesh2sdf.py:119-139`` — exact here, since the procedural scenes
  *are* the primitives).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import raymarch, tsdf as tsdf_lib
from ..sim import contact as contact_lib
from ..sim import engine, kinematics
from ..utils import camera

IMG_H, IMG_W = 288 // 4, 512 // 4       # hand_base.py:171-172
VOL_H, VOL_W = 288, 512                 # hand_base.py:176-177


class VisionRig:
    def __init__(self, cam_cfg: dict, tsdf_cfg: dict, learn_input_mode: str,
                 im_scale: int = 1):
        """im_scale > 1 shrinks the volumetric render (tests)."""
        self.mode = learn_input_mode
        if "img" in learn_input_mode:
            self.num_view = 1
            self.im_h, self.im_w = IMG_H, IMG_W
        else:
            self.num_view = 3
            self.im_h, self.im_w = VOL_H // im_scale, VOL_W // im_scale
        self.poses = camera.gen_camera_poses(
            cam_cfg["look_at"], cam_cfg["radius"], num_views=self.num_view)
        self.intrinsic = camera.camera_intrinsics(self.im_w, self.im_h)
        self.tsdf_spec = tsdf_lib.make_tsdf_spec(
            self.poses, self.intrinsic, self.im_h, self.im_w,
            size=tsdf_cfg["size"], resolution=tsdf_cfg["resolution"],
            origin=tsdf_cfg["origin"])
        # ground-truth volume grid for mesh_tsdf
        self.grid_points = jnp.asarray(self.tsdf_spec.world_points)
        self.sdf_trunc = self.tsdf_spec.sdf_trunc
        self.coarse_to_fine = bool(cam_cfg.get("coarse_to_fine", True))


def scene_prims(env, sim: engine.SceneState) -> raymarch.ScenePrims:
    """Assemble the analytic primitive set of the current scene state."""
    E = sim.robot.qpos.shape[0]
    fk_r = kinematics.forward_kinematics(env.scene.robot, sim.robot)
    centers = contact_lib.sphere_positions(env.scene.robot, fk_r,
                                           env.scene.spheres, E)
    radius = jnp.broadcast_to(jnp.asarray(env.scene.spheres.radius)[None],
                              centers.shape[:2])
    if env.scene.obj_tree is not None:
        fk_o = kinematics.forward_kinematics(env.scene.obj_tree, sim.obj)
        bp, bq = engine.obj_box_world(env.scene.obj_tree, env.scene.obj_boxes,
                                      fk_o, E)
        half = jnp.broadcast_to(
            jnp.asarray(env.scene.obj_boxes.half_extents), bp.shape[:2] + (3,))
        mask = jnp.broadcast_to(jnp.asarray(env.scene.obj_boxes.geom_mask),
                                bp.shape[:2])
    else:
        fb = env.scene.free_body
        bp = sim.body.pos[:, None, :]
        bq = sim.body.quat[:, None, :]
        half = jnp.broadcast_to(jnp.asarray(fb.half_extents), (E, 3))[:, None]
        mask = jnp.ones((E, 1))
    return raymarch.ScenePrims(
        sphere_center=centers, sphere_radius=radius,
        box_pos=bp, box_quat=bq, box_half=half, box_mask=mask, ground=True)


def render_obs(env, rig: VisionRig, sim: engine.SceneState) -> Dict:
    """Compute the configured vision observation (flattened, ≙ the shapes of
    ``cfg/tasks/*.yaml`` obs_mode)."""
    mode = rig.mode
    prims = scene_prims(env, sim)
    E = prims.sphere_center.shape[0]
    out = {}

    if mode == "mesh_tsdf":
        # chunk the res³ grid query: the all-pairs [E, N, G, 3] candidate
        # temporaries at N = 50³ otherwise blow past HBM (22 GB at 16 envs)
        N = rig.grid_points.shape[0]
        n_chunks = max(1, N // 16384)
        while N % n_chunks:
            n_chunks -= 1
        pts = rig.grid_points.reshape(n_chunks, N // n_chunks, 3)
        d = jax.lax.map(
            lambda c: raymarch.scene_sdf(
                prims, jnp.broadcast_to(c[None], (E,) + c.shape)),
            pts)                                    # [C, E, N/C]
        d = jnp.moveaxis(d, 0, 1).reshape(E, N)
        out[mode] = jnp.clip(d / rig.sdf_trunc, -1.0, 1.0)
        return out

    # rendered-depth training path: the TPU kernel's coarse-to-fine
    # pre-pass (quarter-res march seeds a short full-res refine) is ~2-3x
    # faster at 98.5 % of pixels within 5 mm — right for training obs;
    # parity tests compare the exact (non-c2f) marcher instead
    depth = raymarch.render_depth(prims, rig.poses, rig.intrinsic,
                                  rig.im_h, rig.im_w,
                                  coarse_to_fine=rig.coarse_to_fine)
    if mode == "depth_tsdf":
        out[mode] = tsdf_lib.integrate(rig.tsdf_spec, depth).reshape(E, -1)
    elif mode == "depth_pc":
        out[mode] = tsdf_lib.depth_to_pointcloud(
            rig.tsdf_spec, depth, k=1024).reshape(E, -1)
    elif mode == "depth_sparse":
        out[mode] = tsdf_lib.sparse_voxel(
            rig.tsdf_spec, depth, k=1024).reshape(E, -1)
    elif mode == "depth_img":
        out[mode] = depth[:, 0].reshape(E, -1)
    elif mode == "rgb_img":
        # Lambertian-shaded per-segment albedo RGB (≙ Isaac RGB camera,
        # hand_base.py:342-353; untextured URDF colors there)
        rgb = raymarch.render_rgb(prims, rig.poses[:1], rig.intrinsic,
                                  rig.im_h, rig.im_w, depth=depth[:, :1])
        # [E, 1, H, W, 3] → channel-first [E, 3, H, W] flat
        out[mode] = jnp.moveaxis(rgb[:, 0], -1, 1).reshape(E, -1)
    else:
        raise NotImplementedError(mode)
    return out
