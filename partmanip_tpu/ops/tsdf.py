"""Multi-view depth → TSDF fusion / point clouds / sparse voxels.

≙ ``utils/depth2tsdf.py`` (``TSDFVolume``): the voxel→pixel projection
tables are precomputed once per camera rig (``register_camera``,
``depth2tsdf.py:32-66``); per-step fusion is pure gathers + weighted
averaging, batched over envs — the renderer's output never leaves HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .fps import farthest_point_sampling


class TSDFSpec(NamedTuple):
    """Static fusion tables for one camera rig."""

    size: float
    resolution: int
    origin: np.ndarray        # [3]
    voxel_size: float
    sdf_trunc: float
    cam_pose: np.ndarray      # [V, 4, 4] world-from-camera
    intrinsic: np.ndarray     # [3, 3]
    im_h: int
    im_w: int
    # precomputed per (view, voxel):
    pix_x: np.ndarray         # i32 [V, N]
    pix_y: np.ndarray         # i32 [V, N]
    pix_z: np.ndarray         # f32 [V, N] voxel depth in camera frame
    valid: np.ndarray         # bool [V, N]
    world_points: np.ndarray  # f32 [N, 3] voxel centers


def make_tsdf_spec(cam_pose, intrinsic, im_h, im_w, size=0.5, resolution=50,
                   origin=(-0.25, -0.25, -0.0503)) -> TSDFSpec:
    """Build the projection tables (≙ ``register_camera``)."""
    origin = np.asarray(origin, np.float32)
    voxel_size = size / resolution
    sdf_trunc = 4 * voxel_size
    r = np.arange(resolution)
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    coords = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    world = origin + voxel_size * coords                     # [N, 3]

    V = cam_pose.shape[0]
    Rt = cam_pose[:, :3, :3]
    t = cam_pose[:, :3, 3]
    cam_c = np.einsum("nc,vcb->vnb", world, Rt) - np.einsum(
        "vc,vcb->vb", t, Rt)[:, None, :]
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    pz = cam_c[..., 2]
    px = np.round(cam_c[..., 0] * fx / np.maximum(pz, 1e-9) + cx).astype(np.int64)
    py = np.round(cam_c[..., 1] * fy / np.maximum(pz, 1e-9) + cy).astype(np.int64)
    valid = (px >= 0) & (px < im_w) & (py >= 0) & (py < im_h) & (pz > 0)
    return TSDFSpec(
        size=size, resolution=resolution, origin=origin,
        voxel_size=voxel_size, sdf_trunc=sdf_trunc,
        cam_pose=np.asarray(cam_pose, np.float32),
        intrinsic=np.asarray(intrinsic, np.float32), im_h=im_h, im_w=im_w,
        pix_x=np.where(valid, px, 0).astype(np.int32),
        pix_y=np.where(valid, py, 0).astype(np.int32),
        pix_z=pz.astype(np.float32), valid=valid,
        world_points=world.astype(np.float32),
    )


def integrate(spec: TSDFSpec, depth: jnp.ndarray) -> jnp.ndarray:
    """Fuse depth [E, V, H, W] into a TSDF volume [E, res, res, res]
    (averaging fusion ≙ ``TSDFVolume.integrate``, ``depth2tsdf.py:68-86``)."""
    E, V = depth.shape[:2]
    flat = depth.reshape(E, V, -1)
    lin = (spec.pix_y.astype(np.int64) * spec.im_w
           + spec.pix_x.astype(np.int64)).astype(np.int32)   # [V, N]
    lin_b = jnp.broadcast_to(jnp.asarray(lin)[None], (E,) + lin.shape)
    depth_val = jnp.take_along_axis(flat, lin_b, axis=-1)     # [E, V, N]

    diff = depth_val - jnp.asarray(spec.pix_z)[None]
    tsdf = jnp.clip(diff / spec.sdf_trunc, max=1.0)
    valid = (jnp.asarray(spec.valid)[None] & (depth_val > 0)
             & (diff >= -spec.sdf_trunc))
    n_valid = valid.sum(axis=1).astype(jnp.float32)           # [E, N]
    avg = jnp.where(valid, tsdf, 0.0).sum(axis=1) / jnp.maximum(n_valid, 1.0)
    vol = jnp.where(n_valid > 0, avg, 1.0)
    r = spec.resolution
    return vol.reshape(E, r, r, r)


def depth_to_pointcloud(spec: TSDFSpec, depth: jnp.ndarray,
                        k: int = 1024) -> jnp.ndarray:
    """Unproject all views, crop to the workspace AABB, FPS to k points
    (≙ ``TSDFVolume.depth2pc``, ``depth2tsdf.py:136-173``; invalid points
    are zeroed before FPS exactly like the reference)."""
    E, V, H, W = depth.shape
    u = np.arange(W)
    v = np.arange(H)
    uu, vv = np.meshgrid(u, v)
    fx, fy = spec.intrinsic[0, 0], spec.intrinsic[1, 1]
    cx, cy = spec.intrinsic[0, 2], spec.intrinsic[1, 2]
    ray_x = ((uu - cx) / fx).reshape(-1)
    ray_y = ((vv - cy) / fy).reshape(-1)

    z = depth.reshape(E, V, -1)
    pts_cam = jnp.stack([
        z * jnp.asarray(ray_x, jnp.float32)[None, None],
        z * jnp.asarray(ray_y, jnp.float32)[None, None],
        z,
    ], axis=-1)                                               # [E, V, HW, 3]
    R = jnp.asarray(spec.cam_pose[:, :3, :3])
    t = jnp.asarray(spec.cam_pose[:, :3, 3])
    world = jnp.einsum("evnc,vbc->evnb", pts_cam, R) + t[None, :, None, :]
    world = world.reshape(E, -1, 3)

    lo = jnp.asarray(spec.origin)
    hi = lo + spec.size
    valid = jnp.all((world > lo) & (world < hi), axis=-1)
    world = world * valid[..., None]
    import jax as _jax
    if world.shape[1] % 128 == 0 and _jax.default_backend() == "tpu":
        from .fps import farthest_point_sampling_pallas
        idx = farthest_point_sampling_pallas(world, k)
        return jnp.take_along_axis(world, idx[..., None].repeat(3, 2), axis=1)
    pc, _ = farthest_point_sampling(world, k)
    return pc


def extract_surface_points(spec: TSDFSpec, vol: jnp.ndarray,
                           k: int = 1024) -> jnp.ndarray:
    """Level-0 surface point cloud from a TSDF volume [E, r, r, r] → [E, k, 3]
    (≙ ``TSDFVolume.extract_point_cloud``, ``depth2tsdf.py:122-134``).

    The reference runs skimage marching cubes per env on the host and returns
    a ragged vertex list; here every grid edge with a sign change yields one
    linearly-interpolated zero crossing — the same level-set samples, but
    batched over envs with static shapes (FPS pads/selects down to k), so it
    stays inside the jitted program instead of round-tripping to CPU.
    """
    E = vol.shape[0]
    r = spec.resolution
    origin = jnp.asarray(spec.origin)

    def axis_crossings(axis):
        a = jax.lax.slice_in_dim(vol, 0, r - 1, axis=1 + axis)
        b = jax.lax.slice_in_dim(vol, 1, r, axis=1 + axis)
        cross = (a * b < 0) & (jnp.abs(a) < 1.0) & (jnp.abs(b) < 1.0)
        t = a / jnp.where(jnp.abs(a - b) > 1e-12, a - b, 1e-12)   # frac along edge
        rs = [r, r, r]
        rs[axis] -= 1
        g = np.stack(np.meshgrid(*[np.arange(n) for n in rs], indexing="ij"),
                     -1).astype(np.float32)                        # [.,.,.,3]
        base = jnp.asarray(g)[None]
        off = jnp.zeros(3).at[axis].set(1.0)
        pos = origin + spec.voxel_size * (
            base + jnp.clip(t, 0.0, 1.0)[..., None] * off)
        return (pos.reshape(E, -1, 3), cross.reshape(E, -1))

    pts, mask = zip(*(axis_crossings(ax) for ax in range(3)))
    pts = jnp.concatenate(pts, axis=1)
    mask = jnp.concatenate(mask, axis=1)
    pts = pts * mask[..., None]         # invalid → origin cluster, as depth2pc
    sampled, _ = farthest_point_sampling(pts, k)
    return sampled


def sparse_voxel(spec: TSDFSpec, depth: jnp.ndarray, k: int = 1024,
                 thres: float = 0.2) -> jnp.ndarray:
    """Near-surface voxel FPS → [E, k, 4] (ijk coords + tsdf)
    (≙ ``TSDFVolume.sparse_voxel``, ``depth2tsdf.py:88-120``)."""
    vol = integrate(spec, depth)
    E = vol.shape[0]
    r = spec.resolution
    flat = vol.reshape(E, -1)
    coords = jnp.asarray(
        np.stack(np.meshgrid(np.arange(r), np.arange(r), np.arange(r),
                             indexing="ij"), -1).reshape(-1, 3).astype(np.float32))
    near = (flat < thres) & (flat > -thres)
    pts = jnp.where(near[..., None], coords[None], 0.0)
    sampled, idx = farthest_point_sampling(pts, k)
    tsdf_at = jnp.take_along_axis(flat, idx, axis=-1)
    return jnp.concatenate([sampled, tsdf_at[..., None]], axis=-1)
