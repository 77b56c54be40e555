"""Signed-distance fields: TPU mesh→SDF baking + batched grid queries.

Replaces the reference's CUDA/native SDF stack:

* ``bake_mesh_sdf`` ≙ kaolin ``point_to_mesh_distance`` + ``check_sign``
  (``utils/mesh2sdf.py:201-237``): exact point-triangle distances batched on
  the MXU, with a **generalized winding number** sign (Jacobson et al.) —
  robust on open/dirty meshes, which also removes the ManifoldPlus
  watertighting step (``mesh2sdf.py:158-167``);
* ``grid_query`` ≙ the trilinear interpolation kernel
  (``mesh2sdf.py:239-272``), vectorized over parts and envs;
* ``scene_tsdf`` ≙ ``TSDFfromMesh.query_tsdf_parallel``
  (``mesh2sdf.py:119-139``): min over posed part SDFs + the analytic ground
  plane, truncated to [-1, 1].

Baked grids use the same .npy dict layout as the reference
({'sdf', 'bbox_min', 'voxel_size'}) so existing asset caches drop in.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _point_triangle_dist_sq(p, a, b, c):
    """Squared distance from points p [P, 3] to triangles (a, b, c) [T, 3].

    Vectorized over the [P, T] grid; the standard region classification of
    the closest point (face / edge / vertex), branch-free.
    """
    ab = b - a            # [T, 3]
    ac = c - a
    ap = p[:, None, :] - a[None]     # [P, T, 3]

    d1 = jnp.einsum("tc,ptc->pt", ab, ap)
    d2 = jnp.einsum("tc,ptc->pt", ac, ap)
    bp = p[:, None, :] - b[None]
    d3 = jnp.einsum("tc,ptc->pt", ab, bp)
    d4 = jnp.einsum("tc,ptc->pt", ac, bp)
    cp = p[:, None, :] - c[None]
    d5 = jnp.einsum("tc,ptc->pt", ab, cp)
    d6 = jnp.einsum("tc,ptc->pt", ac, cp)

    # barycentric candidates
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # region masks
    in_a = (d1 < 0) & (d2 < 0)
    in_b = (d3 > 0) & (d4 <= d3)
    in_c = (d6 > 0) & (d5 <= d6)
    on_ab = (vc < 0) & (d1 > 0) & (d3 < 0)
    on_ac = (vb < 0) & (d2 > 0) & (d6 < 0)
    on_bc = (va < 0) & ((d4 - d3) > 0) & ((d5 - d6) > 0)

    # closest points per region
    t_ab = jnp.clip(d1 / (d1 - d3 + 1e-30), 0, 1)
    t_ac = jnp.clip(d2 / (d2 - d6 + 1e-30), 0, 1)
    t_bc = jnp.clip((d4 - d3) / ((d4 - d3) + (d5 - d6) + 1e-30), 0, 1)

    denom = va + vb + vc
    v = vb / (denom + 1e-30)
    w = vc / (denom + 1e-30)

    q_face = a[None] + v[..., None] * ab[None] + w[..., None] * ac[None]
    q_ab = a[None] + t_ab[..., None] * ab[None]
    q_ac = a[None] + t_ac[..., None] * ac[None]
    q_bc = b[None] + t_bc[..., None] * (c - b)[None]

    q = q_face
    q = jnp.where(on_bc[..., None], q_bc, q)
    q = jnp.where(on_ac[..., None], q_ac, q)
    q = jnp.where(on_ab[..., None], q_ab, q)
    q = jnp.where(in_c[..., None], c[None], q)
    q = jnp.where(in_b[..., None], b[None], q)
    q = jnp.where(in_a[..., None], a[None], q)

    d = p[:, None, :] - q
    return jnp.einsum("ptc,ptc->pt", d, d)


def _winding_number(p, a, b, c):
    """Generalized winding number of points w.r.t. the triangle soup
    (van Oosterom–Strackee solid angles). ≈1 inside, ≈0 outside."""
    ra = a[None] - p[:, None, :]
    rb = b[None] - p[:, None, :]
    rc = c[None] - p[:, None, :]
    la = jnp.linalg.norm(ra, axis=-1)
    lb = jnp.linalg.norm(rb, axis=-1)
    lc = jnp.linalg.norm(rc, axis=-1)
    num = jnp.einsum("ptc,ptc->pt", ra, jnp.cross(rb, rc))
    den = (la * lb * lc + jnp.einsum("ptc,ptc->pt", ra, rb) * lc
           + jnp.einsum("ptc,ptc->pt", rb, rc) * la
           + jnp.einsum("ptc,ptc->pt", rc, ra) * lb)
    omega = 2.0 * jnp.arctan2(num, den)
    return jnp.sum(omega, axis=-1) / (4.0 * jnp.pi)


def bake_mesh_sdf(vertices: np.ndarray, faces: np.ndarray,
                  voxel_size: float = 0.002, trunc: float = None,
                  chunk: int = 4096) -> dict:
    """Bake a truncated SDF grid for a triangle mesh.

    Grid covers the mesh AABB + 2·trunc margin at ``voxel_size`` (reference
    defaults 2 mm / trunc 4·(size/res), ``mesh2sdf.py:39-40``).
    Returns {'sdf': [X, Y, Z] f32, 'bbox_min': [3], 'voxel_size': float}.
    """
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int32)
    # drop degenerate faces (≙ mesh2sdf.py:209-210)
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 0] != faces[:, 2])
          & (faces[:, 1] != faces[:, 2]))
    faces = faces[ok]

    if trunc is None:
        trunc = 4.0 * voxel_size * 10  # generous default margin
    vmin = vertices.min(0) - 2 * trunc
    vmax = vertices.max(0) + 2 * trunc
    shape = np.ceil((vmax - vmin) / voxel_size).astype(int)
    xs = vmin[0] + voxel_size * np.arange(shape[0])
    ys = vmin[1] + voxel_size * np.arange(shape[1])
    zs = vmin[2] + voxel_size * np.arange(shape[2])
    grid = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3)

    a = jnp.asarray(vertices[faces[:, 0]])
    b = jnp.asarray(vertices[faces[:, 1]])
    c = jnp.asarray(vertices[faces[:, 2]])

    @jax.jit
    def one_chunk(pts):
        d2 = _point_triangle_dist_sq(pts, a, b, c)
        dist = jnp.sqrt(jnp.min(d2, axis=-1))
        wn = _winding_number(pts, a, b, c)
        sign = jnp.where(wn > 0.5, -1.0, 1.0)
        return sign * dist

    out = np.empty(grid.shape[0], np.float32)
    n = grid.shape[0]
    pad = (-n) % chunk
    gp = np.concatenate([grid, np.zeros((pad, 3), np.float32)], 0)
    for i in range(0, n + pad, chunk):
        out_i = np.asarray(one_chunk(jnp.asarray(gp[i:i + chunk])))
        out[i:min(i + chunk, n)] = out_i[: max(0, min(chunk, n - i))]
    sdf = np.clip(out, -trunc, trunc).reshape(tuple(shape))
    return {"sdf": sdf, "bbox_min": vmin.astype(np.float32),
            "voxel_size": float(voxel_size)}


class GridStack(NamedTuple):
    """M part SDF grids padded to a common shape for batched query
    (≙ ``TSDFfromMesh.merge_sdf_field``, ``mesh2sdf.py:169-199``)."""

    sdf: jnp.ndarray         # [M, X, Y, Z] padded with +trunc
    bbox_min: jnp.ndarray    # [M, 3]
    voxel_size: jnp.ndarray  # [M]


def stack_grids(grids: list, pad_value: float) -> GridStack:
    shapes = np.array([g["sdf"].shape for g in grids])
    tgt = shapes.max(0)
    sdfs = []
    for g in grids:
        s = g["sdf"]
        pad = [(0, int(tgt[i] - s.shape[i])) for i in range(3)]
        sdfs.append(np.pad(s, pad, constant_values=pad_value))
    return GridStack(
        sdf=jnp.asarray(np.stack(sdfs)),
        bbox_min=jnp.asarray(np.stack([g["bbox_min"] for g in grids])),
        voxel_size=jnp.asarray(np.array([g["voxel_size"] for g in grids],
                                        np.float32)),
    )


def grid_query(stack: GridStack, points: jnp.ndarray,
               outside_value: float) -> jnp.ndarray:
    """Trilinear SDF lookup. points [..., M, N, 3] in each part's local
    frame → values [..., M, N] (``outside_value`` beyond the grid)."""
    M = stack.sdf.shape[0]
    X, Y, Z = stack.sdf.shape[1:]
    idx = ((points - stack.bbox_min[:, None, :])
           / stack.voxel_size[:, None, None])
    valid = (idx >= 1.0) & (idx <= jnp.asarray(
        [X - 2, Y - 2, Z - 2], jnp.float32))
    valid = jnp.all(valid, axis=-1)
    idx = jnp.clip(idx, 0.0, jnp.asarray([X - 2, Y - 2, Z - 2], jnp.float32))
    i0 = idx.astype(jnp.int32)
    f = idx - i0
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    flat = stack.sdf.reshape(M, -1)
    sy, sz = Y * Z, Z
    lead = points.shape[:-3]  # env dims (possibly empty)
    N = points.shape[-2]
    lin000 = (i0[..., 0] * sy + i0[..., 1] * sz + i0[..., 2])

    def g(dlin):
        lin = (lin000 + dlin).reshape((-1, M, N) if lead else (M, N))
        if lead:
            out = jax.vmap(
                lambda l: jnp.take_along_axis(flat, l, axis=-1))(lin)
            return out.reshape(lead + (M, N))
        return jnp.take_along_axis(flat, lin, axis=-1)

    c000 = g(0)
    c001 = g(1)
    c010 = g(sz)
    c011 = g(sz + 1)
    c100 = g(sy)
    c101 = g(sy + 1)
    c110 = g(sy + sz)
    c111 = g(sy + sz + 1)

    val = (((c000 * (1 - fz) + c001 * fz) * (1 - fy)
            + (c010 * (1 - fz) + c011 * fz) * fy) * (1 - fx)
           + ((c100 * (1 - fz) + c101 * fz) * (1 - fy)
              + (c110 * (1 - fz) + c111 * fz) * fy) * fx)
    return jnp.where(valid, val, outside_value)


def scene_sdf(stack: GridStack, part_rot: jnp.ndarray, part_pos: jnp.ndarray,
              points: jnp.ndarray, ground: bool = True) -> jnp.ndarray:
    """Scene SDF = min over posed parts (+ z=0 ground plane).

    Args:
        part_rot: [E, M, 3, 3] world-from-part rotations.
        part_pos: [E, M, 3].
        points: [N, 3] world query points (shared across envs) or [E, N, 3].
    Returns: [E, N] un-truncated signed distances.
    """
    # transform world points into each part frame: p_local = Rᵀ(x − t)
    if points.ndim == 2:
        x = points[None, None, :, :] - part_pos[:, :, None, :]
    else:
        x = points[:, None, :, :] - part_pos[:, :, None, :]
    local = jnp.einsum("emba,emnb->emna", part_rot, x)
    vals = grid_query(stack, local, outside_value=jnp.inf)   # [E, M, N]
    d = jnp.min(vals, axis=-2)
    if ground:
        z = points[..., 2] if points.ndim == 3 else points[None, :, 2]
        d = jnp.minimum(d, z)
    return d


def scene_tsdf(stack: GridStack, part_rot, part_pos, points,
               sdf_trunc: float, ground: bool = True) -> jnp.ndarray:
    """Truncated scene SDF in [-1, 1] (≙ ``query_tsdf_parallel``,
    ``mesh2sdf.py:119-139``; outside-grid parts contribute +1·trunc)."""
    # outside-grid values must behave like "far": use +trunc not inf so the
    # min over parts matches the reference's (query=1 ⇒ trunc) convention
    if points.ndim == 2:
        x = points[None, None, :, :] - part_pos[:, :, None, :]
    else:
        x = points[:, None, :, :] - part_pos[:, :, None, :]
    local = jnp.einsum("emba,emnb->emna", part_rot, x)
    vals = grid_query(stack, local, outside_value=sdf_trunc)  # [E, M, N]
    d = jnp.min(vals, axis=-2)
    if ground:
        z = points[..., 2] if points.ndim == 3 else points[None, :, 2]
        d = jnp.minimum(d, z)
    return jnp.clip(d / sdf_trunc, -1.0, 1.0)


def grid_query_grad(stack: GridStack, gid: jnp.ndarray,
                    points: jnp.ndarray, outside_value: float):
    """Trilinear SDF value + gradient with a per-query grid index.

    The contact-path variant of :func:`grid_query` (spheres vs baked mesh
    geoms, ≙ PhysX SDF-mode collision ``<sdf resolution>``,
    ``franka_panda_sdf_mobile.urdf:231``): each query carries its own grid id
    so heterogeneous per-env objects batch in one gather.

    Args:
        gid: i32 [...] grid index into the stack per query point.
        points: f32 [..., 3] in the grid's local (already scaled) frame.
    Returns:
        (value [...], grad [..., 3] — the analytic gradient of the trilinear
        interpolant, zero outside the grid).
    """
    M = stack.sdf.shape[0]
    X, Y, Z = stack.sdf.shape[1:]
    bbox = stack.bbox_min[gid]                      # [..., 3]
    vs = stack.voxel_size[gid]                      # [...]
    idx = (points - bbox) / vs[..., None]
    hi = jnp.asarray([X - 2, Y - 2, Z - 2], jnp.float32)
    valid = jnp.all((idx >= 1.0) & (idx <= hi), axis=-1)
    idx = jnp.clip(idx, 0.0, hi)
    i0 = idx.astype(jnp.int32)
    f = idx - i0
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    flat = stack.sdf.reshape(-1)
    sy, sz = Y * Z, Z
    base = gid * (X * Y * Z) + i0[..., 0] * sy + i0[..., 1] * sz + i0[..., 2]

    def g(d):
        return flat[(base + d).reshape(-1)].reshape(base.shape)

    c000, c001 = g(0), g(1)
    c010, c011 = g(sz), g(sz + 1)
    c100, c101 = g(sy), g(sy + 1)
    c110, c111 = g(sy + sz), g(sy + sz + 1)

    # interpolate down the axes, keeping the partials
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    val = c0 * (1 - fx) + c1 * fx

    dval_dx = (c1 - c0)
    dval_dy = ((c01 - c00) * (1 - fx) + (c11 - c10) * fx)
    dval_dz = (((c001 - c000) * (1 - fy) + (c011 - c010) * fy) * (1 - fx)
               + ((c101 - c100) * (1 - fy) + (c111 - c110) * fy) * fx)
    grad = jnp.stack([dval_dx, dval_dy, dval_dz], axis=-1) / vs[..., None]
    val = jnp.where(valid, val, outside_value)
    grad = jnp.where(valid[..., None], grad, 0.0)
    return val, grad
