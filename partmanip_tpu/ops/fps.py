"""Farthest point sampling (≙ pytorch3d ``sample_farthest_points``, used at
``utils/depth2tsdf.py:108-119`` and ``:140-160``).

Iterative argmax over a running min-distance field: K steps of fully
vectorized [B, N] updates under ``lax.fori_loop``.  Matches pytorch3d
semantics with ``random_start_point=False``: selection starts at index 0,
and invalid points are expected to be pre-zeroed by the caller (the
reference multiplies by the validity mask, ``depth2tsdf.py:159``) so they
collapse into one origin cluster that is picked at most once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sampling(points: jnp.ndarray, k: int):
    """Args:
        points: [B, N, C] (C ≥ 3; distances use all C coords).
        k: number of samples (static).
    Returns:
        (sampled [B, k, C], indices [B, k])
    """
    B, N, C = points.shape

    def body(i, carry):
        min_d, idx = carry
        last = idx[:, i - 1] if False else jnp.take_along_axis(
            idx, jnp.full((B, 1), i - 1, jnp.int32), axis=1)[:, 0]
        last_pt = jnp.take_along_axis(
            points, last[:, None, None].repeat(C, 2), axis=1)[:, 0]
        d = jnp.sum((points - last_pt[:, None, :]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        idx = jax.lax.dynamic_update_slice_in_dim(
            idx, nxt[:, None], i, axis=1)
        return min_d, idx

    idx0 = jnp.zeros((B, k), jnp.int32)
    min_d0 = jnp.full((B, N), jnp.inf)
    _, idx = jax.lax.fori_loop(1, k, body, (min_d0, idx0))
    sampled = jnp.take_along_axis(points, idx[..., None].repeat(C, 2), axis=1)
    return sampled, idx
