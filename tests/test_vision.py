"""Vision stack tests: FPS, TSDF fusion, SDF bake/query, raymarch renderer
(SURVEY.md §2 #13-16; geometric ground-truth checks replace the reference's
eyeball-dump debugging, SURVEY.md §4.6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partmanip_tpu.ops import fps, raymarch, sdf, tsdf
from partmanip_tpu.utils import camera


class TestFPS:
    def test_spreads_points(self):
        """FPS on a line picks the extremes first."""
        pts = jnp.asarray(np.linspace(0, 1, 100)[:, None] * np.ones(3))[None]
        sampled, idx = fps.farthest_point_sampling(pts, 4)
        ii = sorted(np.asarray(idx[0]).tolist())
        assert 0 in ii and 99 in ii     # start + farthest
        # third pick bisects
        assert any(abs(i - 50) < 2 for i in ii)

    def test_distinct_indices(self):
        pts = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 3))
        _, idx = fps.farthest_point_sampling(pts, 32)
        for b in range(2):
            assert len(np.unique(np.asarray(idx[b]))) == 32


class TestBoxSDFBake:
    def test_bake_box_mesh(self):
        """Baked SDF of a unit box matches the analytic box SDF."""
        h = 0.1
        v = np.array([[sx * h, sy * h, sz * h]
                      for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                     np.float32)
        f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                      [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                      [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
        g = sdf.bake_mesh_sdf(v, f, voxel_size=0.02, trunc=0.08)
        # check center is inside (negative) with |d| ≈ h
        stack = sdf.stack_grids([g], pad_value=0.08)
        pts = jnp.array([[[0.0, 0, 0], [0.3, 0, 0], [0.12, 0, 0]]])  # [M=1,N,3]
        vals = np.asarray(sdf.grid_query(stack, pts, outside_value=1.0))[0]
        assert vals[0] < -0.05          # deep inside
        assert vals[1] > 0.06           # outside (or beyond grid → 1)
        assert 0.0 < vals[2] < 0.05     # just outside the +x face

    def test_scene_tsdf_ground(self):
        """With no parts in range, scene TSDF is the clipped ground plane."""
        g = sdf.bake_mesh_sdf(
            np.array([[0, 0, 10.0], [0.1, 0, 10], [0, 0.1, 10]], np.float32),
            np.array([[0, 1, 2]]), voxel_size=0.05, trunc=0.1)
        stack = sdf.stack_grids([g], pad_value=0.1)
        pts = jnp.array([[0.0, 0, 0.5], [0.0, 0, 0.02], [0.0, 0, -0.1]])
        rotm = jnp.eye(3)[None, None]
        pos = jnp.zeros((1, 1, 3))
        out = np.asarray(sdf.scene_tsdf(stack, rotm, pos, pts, sdf_trunc=0.08))
        assert out.shape == (1, 3)
        np.testing.assert_allclose(out[0], [1.0, 0.25, -1.0], atol=1e-5)


class TestTSDFFusion:
    def make_rig(self, H=36, W=64):
        poses = camera.gen_camera_poses([0, 0, 0], radius=0.8, num_views=3)
        intr = camera.camera_intrinsics(W, H)
        return tsdf.make_tsdf_spec(poses, intr, H, W, size=0.5, resolution=20)

    def test_render_and_fuse_sphere(self):
        """Render a sphere with the raymarcher, fuse, and check the TSDF
        sign at the sphere center vs far free space."""
        spec = self.make_rig()
        E = 2
        prims = raymarch.ScenePrims(
            sphere_center=jnp.tile(jnp.array([0.0, 0, 0.08]), (E, 1, 1)),
            sphere_radius=jnp.full((E, 1), 0.06),
            box_pos=jnp.zeros((E, 1, 3)),
            box_quat=jnp.tile(jnp.array([0.0, 0, 0, 1]), (E, 1, 1)),
            box_half=jnp.zeros((E, 1, 3)),
            box_mask=jnp.zeros((E, 1)),
            ground=True,
        )
        depth = raymarch.render_depth(prims, spec.cam_pose, spec.intrinsic,
                                      spec.im_h, spec.im_w)
        assert depth.shape == (E, 3, 36, 64)
        d = np.asarray(depth)
        assert d.min() > 0.3            # nothing closer than ~the rig radius
        assert d.max() <= 100.0

        vol = tsdf.integrate(spec, depth)
        assert vol.shape == (E, 20, 20, 20)
        v = np.asarray(vol)
        # voxel at the sphere center → behind the surface → negative
        ijk = np.round((np.array([0, 0, 0.08]) - spec.origin)
                       / spec.voxel_size).astype(int)
        assert v[0, ijk[0], ijk[1], ijk[2]] < 0
        # free-space voxel well above the sphere → positive
        ijk2 = np.round((np.array([0.15, 0.15, 0.2]) - spec.origin)
                        / spec.voxel_size).astype(int)
        assert v[0, ijk2[0], ijk2[1], ijk2[2]] > 0.5

    def test_extract_surface_points_on_sphere(self):
        """Zero-crossing extraction (≙ marching-cubes PC) recovers the fused
        sphere's surface: live samples sit at radius ± a voxel."""
        spec = self.make_rig()
        E = 2
        prims = raymarch.ScenePrims(
            sphere_center=jnp.tile(jnp.array([0.0, 0, 0.08]), (E, 1, 1)),
            sphere_radius=jnp.full((E, 1), 0.06),
            box_pos=jnp.zeros((E, 1, 3)),
            box_quat=jnp.tile(jnp.array([0.0, 0, 0, 1]), (E, 1, 1)),
            box_half=jnp.zeros((E, 1, 3)),
            box_mask=jnp.zeros((E, 1)),
            ground=False,
        )
        depth = raymarch.render_depth(prims, spec.cam_pose, spec.intrinsic,
                                      spec.im_h, spec.im_w)
        vol = tsdf.integrate(spec, depth)
        pc = tsdf.extract_surface_points(spec, vol, k=256)
        assert pc.shape == (E, 256, 3)
        p = np.asarray(pc[0])
        live = p[np.linalg.norm(p, axis=-1) > 1e-6]
        assert live.shape[0] > 50
        r = np.linalg.norm(live - np.array([0, 0, 0.08]), axis=-1)
        # crossings lie on the level set, within ~a voxel (2.5 cm grid)
        assert np.percentile(np.abs(r - 0.06), 90) < 0.03

    def test_depth_to_pointcloud_on_sphere(self):
        spec = self.make_rig()
        E = 1
        prims = raymarch.ScenePrims(
            sphere_center=jnp.tile(jnp.array([0.0, 0, 0.1]), (E, 1, 1)),
            sphere_radius=jnp.full((E, 1), 0.05),
            box_pos=jnp.zeros((E, 1, 3)),
            box_quat=jnp.tile(jnp.array([0.0, 0, 0, 1]), (E, 1, 1)),
            box_half=jnp.zeros((E, 1, 3)),
            box_mask=jnp.zeros((E, 1)),
            ground=False,
        )
        depth = raymarch.render_depth(prims, spec.cam_pose, spec.intrinsic,
                                      spec.im_h, spec.im_w)
        pc = tsdf.depth_to_pointcloud(spec, depth, k=256)
        assert pc.shape == (1, 256, 3)
        p = np.asarray(pc[0])
        live = p[np.linalg.norm(p, axis=-1) > 1e-6]
        assert live.shape[0] > 100
        r = np.linalg.norm(live - np.array([0, 0, 0.1]), axis=-1)
        # surface samples lie on the sphere (within a voxel of tolerance)
        assert np.percentile(np.abs(r - 0.05), 90) < 0.02


class TestCameraRig:
    def test_poses_look_at_target(self):
        poses = camera.gen_camera_poses([0.1, 0.2, 0.7], radius=1.5,
                                        num_views=3)
        assert poses.shape == (3, 4, 4)
        for pose in poses:
            fwd = pose[:3, 2]
            to_target = np.array([0.1, 0.2, 0.7]) - pose[:3, 3]
            to_target /= np.linalg.norm(to_target)
            assert np.dot(fwd, to_target) > 0.999
            np.testing.assert_allclose(
                np.linalg.norm(pose[:3, 3] - [0.1, 0.2, 0.7]), 1.5, rtol=1e-5)


class TestRaymarchPallas:
    def test_matches_xla_path_in_interpret_mode(self):
        """The Pallas tiled raymarcher reproduces the XLA reference path
        (same march, whole-tile early-out changes nothing per-ray)."""
        from partmanip_tpu.ops import raymarch_tpu
        E = 2
        prims = raymarch.ScenePrims(
            sphere_center=jnp.asarray(
                np.array([[[0.0, 0, 0.08], [0.1, 0.05, 0.15]]] * E,
                         np.float32)),
            sphere_radius=jnp.full((E, 2), 0.05),
            box_pos=jnp.asarray(
                np.array([[[-0.1, 0, 0.1], [0.2, -0.1, 0.05]]] * E,
                         np.float32)),
            box_quat=jnp.tile(
                jnp.asarray(np.array([0.0, 0, 0.3827, 0.9239], np.float32)),
                (E, 2, 1)),
            box_half=jnp.tile(jnp.array([0.06, 0.04, 0.08]), (E, 2, 1)),
            box_mask=jnp.asarray(np.array([[1.0, 1.0]] * E, np.float32)),
            ground=True,
        )
        poses = camera.gen_camera_poses([0, 0, 0.1], radius=0.8, num_views=3)
        intr = camera.camera_intrinsics(64, 36)
        ref = np.asarray(raymarch.render_depth(prims, poses, intr, 36, 64))
        got = np.asarray(raymarch_tpu.render_depth_tpu(
            prims, poses, intr, 36, 64, interpret=True))
        assert got.shape == ref.shape == (E, 3, 36, 64)
        close = np.abs(got - ref) < 1e-3
        # silhouette rays may flip hit/miss between float orderings
        assert close.mean() > 0.98, close.mean()
        both_hit = (ref < 99.0) & (got < 99.0)
        assert np.abs((got - ref)[both_hit]).max() < 1e-2


class TestFPSPallas:
    def test_matches_reference_in_interpret_mode(self):
        from jax.experimental.pallas import tpu as pltpu
        pts = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 3))
        _, ref_idx = fps.farthest_point_sampling(pts, 16)
        with pltpu.force_tpu_interpret_mode():
            idx = fps.farthest_point_sampling_pallas(pts, 16)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


class TestRGBRender:
    def test_shaded_albedo_colors(self):
        """render_rgb: ground pixels take the gray albedo, box pixels the
        box palette hue, shading bounded, misses black."""
        E = 1
        prims = raymarch.ScenePrims(
            sphere_center=jnp.tile(jnp.array([5.0, 5, 5]), (E, 1, 1)),
            sphere_radius=jnp.full((E, 1), 0.01),     # far away
            box_pos=jnp.tile(jnp.array([0.0, 0, 0.1]), (E, 1, 1)),
            box_quat=jnp.tile(jnp.array([0.0, 0, 0, 1]), (E, 1, 1)),
            box_half=jnp.tile(jnp.array([0.08, 0.08, 0.08]), (E, 1, 1)),
            box_mask=jnp.ones((E, 1)),
            ground=True,
        )
        poses = camera.gen_camera_poses([0, 0, 0.1], radius=0.7, num_views=1)
        intr = camera.camera_intrinsics(48, 32)
        rgb = np.asarray(raymarch.render_rgb(prims, poses, intr, 32, 48))
        assert rgb.shape == (E, 1, 32, 48, 3)
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        depth = np.asarray(raymarch.render_depth(prims, poses, intr, 32, 48))
        _, seg = raymarch.scene_sdf_seg(
            prims, jnp.zeros((E, 1, 3)))  # shape probe only
        # box pixels: hue ratio r/g of the first palette box color (brownish)
        flat = rgb[0, 0].reshape(-1, 3)
        lit = flat[flat.sum(-1) > 0.05]
        assert lit.shape[0] > 100
        # both ground-gray (r≈g≈b) and box-brown (r>g>b) pixels present
        ratio = lit[:, 0] / np.maximum(lit[:, 1], 1e-6)
        assert (np.abs(ratio - 1.0) < 0.05).any()      # gray ground
        assert (ratio > 1.3).any()                     # brown box


class TestRaymarchCoarseToFine:
    def test_c2f_close_to_full_march(self):
        from partmanip_tpu.ops import raymarch_tpu
        E = 1
        prims = raymarch.ScenePrims(
            sphere_center=jnp.tile(jnp.array([0.0, 0, 0.12]), (E, 1, 1)),
            sphere_radius=jnp.full((E, 1), 0.06),
            box_pos=jnp.tile(jnp.array([0.1, -0.05, 0.08]), (E, 1, 1)),
            box_quat=jnp.tile(jnp.array([0.0, 0, 0, 1]), (E, 1, 1)),
            box_half=jnp.tile(jnp.array([0.06, 0.05, 0.08]), (E, 1, 1)),
            box_mask=jnp.ones((E, 1)),
            ground=True,
        )
        poses = camera.gen_camera_poses([0, 0, 0.1], radius=0.8, num_views=1)
        intr = camera.camera_intrinsics(64, 32)
        full = np.asarray(raymarch_tpu.render_depth_tpu(
            prims, poses, intr, 32, 64, interpret=True))
        c2f = np.asarray(raymarch_tpu.render_depth_tpu(
            prims, poses, intr, 32, 64, interpret=True, coarse_to_fine=True))
        close = np.abs(full - c2f) < 5e-3
        assert close.mean() > 0.95, close.mean()
