"""Coverage for the aux utilities: pointcloud sampling, rotation extras,
profiler, video, viewer, data_proc helpers."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from partmanip_tpu.ops import pointcloud, rotations as rot


class TestPointCloud:
    def test_mesh_surface_sampling(self):
        # unit right triangle in z=0 plane: all samples inside, z=0
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2]])
        pts = pointcloud.sample_mesh_surface(v, f, 512)
        assert pts.shape == (512, 3)
        assert np.allclose(pts[:, 2], 0)
        assert (pts[:, 0] >= -1e-6).all() and (pts[:, 1] >= -1e-6).all()
        assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-5).all()

    def test_box_surface_sampling(self):
        pts = pointcloud.sample_box_surface((0.1, 0.2, 0.3), 512)
        # every point on the surface: at least one |coord| == half extent
        h = np.array([0.1, 0.2, 0.3])
        on_face = np.isclose(np.abs(pts), h, atol=1e-6).any(axis=-1)
        assert on_face.all()
        assert (np.abs(pts) <= h + 1e-6).all()

    def test_pc_from_parts_query(self):
        parts = [np.zeros((16, 3), np.float32),
                 np.ones((16, 3), np.float32)]
        pc = pointcloud.PCFromParts(parts, num_points=8)
        R = jnp.broadcast_to(jnp.eye(3), (2, 2, 3, 3))
        t = jnp.zeros((2, 2, 3)).at[:, 1].set(jnp.array([1.0, 0, 0]))
        out = pc.query(R, t, jax.random.PRNGKey(0))
        assert out.shape == (2, 8, 3)
        # points come from {0} ∪ {1,1,1}+x
        a = np.asarray(out)
        ok = np.isclose(a, 0).all(-1) | np.isclose(a, [2, 1, 1]).all(-1)
        assert ok.all()


class TestRotationExtras:
    def test_exp_map_roundtrip(self):
        q = rot.quat_unit(jax.random.normal(jax.random.PRNGKey(0), (8, 4)))
        q2 = rot.exp_map_to_quat(rot.quat_to_exp_map(q))
        dot = np.abs(np.asarray(jnp.sum(q * q2, -1)))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_slerp_endpoints_and_midpoint(self):
        q0 = rot.quat_identity((1,))
        q1 = rot.quat_from_angle_axis(jnp.array([1.0]), jnp.array([[0.0, 0, 1]]))
        np.testing.assert_allclose(np.asarray(rot.slerp(q0, q1, 0.0)),
                                   np.asarray(q0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rot.slerp(q0, q1, 1.0)),
                                   np.asarray(q1), atol=1e-6)
        mid = rot.slerp(q0, q1, 0.5)
        np.testing.assert_allclose(
            np.asarray(rot.quat_diff_rad(mid, q0)), 0.5, atol=1e-4)

    def test_heading(self):
        q = rot.quat_from_angle_axis(jnp.array([0.8]), jnp.array([[0.0, 0, 1]]))
        np.testing.assert_allclose(np.asarray(rot.calc_heading(q)), 0.8,
                                   atol=1e-5)
        qi = rot.calc_heading_quat_inv(q)
        np.testing.assert_allclose(
            np.asarray(rot.calc_heading(rot.quat_mul(qi, q))), 0.0, atol=1e-5)

    def test_tan_norm(self):
        q = rot.quat_identity((1,))
        tn = np.asarray(rot.quat_to_tan_norm(q))[0]
        np.testing.assert_allclose(tn, [1, 0, 0, 0, 0, 1], atol=1e-6)


class TestProfilerAndViz:
    def test_time_counter(self):
        from partmanip_tpu.utils import profiler
        profiler.reset()

        @profiler.TimeCounter
        def f():
            return 1

        for _ in range(3):
            f()
        with profiler.TimeCounterSession("sess"):
            pass
        assert profiler._STATS[f.__qualname__][0] == 3
        assert profiler._STATS["sess"][0] == 1
        profiler.reset()

    def test_viewer_dump(self):
        from partmanip_tpu.utils import viewer
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "pc.txt")
            viewer.dump_pointcloud(p, np.random.randn(10, 3))
            assert os.path.exists(p)
            v = viewer.PointCloudViewer(td)
            v.update(np.random.randn(20, 3))
            assert v.count == 1

    def test_save_depth_frame(self):
        from partmanip_tpu.utils import video
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "f.png")
            video.save_depth_frame(p, np.ones((8, 8)) * 1.5)
            assert os.path.exists(p) or os.path.exists(p.replace(".png", ".npy"))

    def test_fetch_scalars_single_transfer(self):
        """fetch_scalars returns plain floats matching per-key fetch, and
        handles mixed 0-d / (1,)-shaped leaves and empty dicts."""
        import jax.numpy as jnp
        from partmanip_tpu.utils.fetch import fetch_scalars
        m = {"a": jnp.float32(1.5), "b": jnp.zeros(()) + 2.0,
             "c": jnp.ones((1,)) * -3.25}
        out = fetch_scalars(m)
        assert out == {"a": 1.5, "b": 2.0, "c": -3.25}
        assert all(type(v) is float for v in out.values())
        assert fetch_scalars({}) == {}


class TestKabsch:
    def test_recovers_rigid_transform(self):
        from partmanip_tpu.utils import camera
        rng = np.random.RandomState(0)
        a = rng.randn(50, 3)
        ang = 0.7
        R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                           [np.sin(ang), np.cos(ang), 0],
                           [0, 0, 1.0]])
        t_true = np.array([0.3, -0.1, 0.5])
        b = a @ R_true.T + t_true
        R, t = camera.kabsch_rt(a, b)
        np.testing.assert_allclose(R, R_true, atol=1e-8)
        np.testing.assert_allclose(t[:, 0], t_true, atol=1e-8)
