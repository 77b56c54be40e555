"""Mesh/primitive surface point sampling → posed scene point clouds.

≙ ``utils/mesh2pc.py`` (``PCfromMesh``): per-part surface point sets sampled
once at load (``mesh2pc.py:32-41``), posed and randomly subsampled at query
(``:56-65``).  Sampling is area-weighted triangle sampling in numpy (no
trimesh dependency); primitive parts (the procedural scenes) sample boxes
and spheres analytically.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def sample_mesh_surface(vertices: np.ndarray, faces: np.ndarray,
                        num_points: int, rng=None) -> np.ndarray:
    """Area-weighted uniform surface samples [num_points, 3]."""
    rng = rng or np.random.RandomState(0)
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
    probs = area / max(area.sum(), 1e-12)
    tri = rng.choice(len(f), size=num_points, p=probs)
    u = rng.rand(num_points, 1)
    w = rng.rand(num_points, 1)
    flip = (u + w) > 1
    u = np.where(flip, 1 - u, u)
    w = np.where(flip, 1 - w, w)
    pts = a[tri] + u * (b[tri] - a[tri]) + w * (c[tri] - a[tri])
    return pts.astype(np.float32)


def sample_box_surface(half_extents, num_points: int, rng=None) -> np.ndarray:
    """Uniform samples on a box surface (for primitive parts)."""
    rng = rng or np.random.RandomState(0)
    h = np.asarray(half_extents, np.float64)
    areas = np.array([h[1] * h[2], h[1] * h[2], h[0] * h[2], h[0] * h[2],
                      h[0] * h[1], h[0] * h[1]])
    face = rng.choice(6, size=num_points, p=areas / areas.sum())
    uv = rng.rand(num_points, 2) * 2 - 1
    pts = np.empty((num_points, 3))
    ax = face // 2
    sgn = np.where(face % 2 == 0, 1.0, -1.0)
    others = np.array([[1, 2], [0, 2], [0, 1]])
    for i in range(num_points):
        pts[i, ax[i]] = sgn[i] * h[ax[i]]
        pts[i, others[ax[i]][0]] = uv[i, 0] * h[others[ax[i]][0]]
        pts[i, others[ax[i]][1]] = uv[i, 1] * h[others[ax[i]][1]]
    return pts.astype(np.float32)


def sample_sphere_surface(radius: float, num_points: int, rng=None):
    rng = rng or np.random.RandomState(0)
    v = rng.randn(num_points, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return (radius * v).astype(np.float32)


class PCFromParts:
    """Pose pre-sampled per-part point sets and subsample to num_points
    (≙ ``PCfromMesh.query_pc``, ``mesh2pc.py:56-65``)."""

    def __init__(self, part_points: List[np.ndarray], num_points: int = 1024):
        self.num_points = num_points
        self.parts = jnp.asarray(np.stack(part_points))  # [M, P, 3]

    def query(self, part_rot, part_pos, rng):
        """part_rot [E, M, 3, 3], part_pos [E, M, 3] → [E, num_points, 3]."""
        posed = jnp.einsum("emab,mpb->empa", part_rot, self.parts) \
            + part_pos[:, :, None, :]
        E, M, P, _ = posed.shape
        flat = posed.reshape(E, M * P, 3)
        idx = jax.random.permutation(rng, M * P)[: self.num_points]
        return flat[:, idx, :]
