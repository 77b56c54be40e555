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


def farthest_point_sampling_pallas(points: jnp.ndarray, k: int):
    """Pallas TPU kernel variant: one kernel instance per batch row keeps the
    running min-distance field in VMEM for all k iterations (the jnp version
    round-trips [B, N] through HBM every iteration).

    points [B, N, C] with N a multiple of 128 (pad upstream; padding points
    should duplicate row 0 so they are never selected). Returns indices
    [B, k] i32; gather the samples with take_along_axis.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = points.shape
    assert N % 128 == 0, "pad N to a lane multiple"

    def kernel(pts_ref, idx_ref, mind_ref):
        # pts_ref: [1, N, C] VMEM; idx_ref: [1, k] SMEM; mind_ref: [N] VMEM
        mind_ref[:] = jnp.full((N,), jnp.inf, jnp.float32)
        idx_ref[0, 0] = 0

        def body(i, last):
            p = pts_ref[0, last, :]                    # [C]
            d = pts_ref[0] - p[None, :]
            dist = jnp.sum(d * d, axis=-1)             # [N]
            mind = jnp.minimum(mind_ref[:], dist)
            mind_ref[:] = mind
            nxt = jnp.argmax(mind).astype(jnp.int32)
            idx_ref[0, i] = nxt
            return nxt

        jax.lax.fori_loop(1, k, body, jnp.int32(0))

    idx = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, k), lambda b: (b, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((N,), jnp.float32)],
    )(points)
    return idx
