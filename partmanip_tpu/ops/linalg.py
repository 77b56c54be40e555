"""Batched small-matrix linear algebra, unrolled for the TPU VPU.

``jnp.linalg.solve`` lowers to XLA's batched LU, which for the tiny (≤16²)
joint-space systems of the simulator compiles to slow while-loops on TPU.
These routines unroll the factorization over the *static* matrix dimension:
every step is an elementwise/vector op batched over envs — no dynamic
control flow, no column pivoting (the systems are SPD by construction:
M + implicit-PD/contact terms).
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_factor(A: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular Cholesky of SPD matrices A [..., D, D], unrolled."""
    D = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(D):
        if j > 0:
            s = A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1)
        else:
            s = A[..., j, j]
        ljj = jnp.sqrt(jnp.maximum(s, 1e-12))
        L = L.at[..., j, j].set(ljj)
        if j + 1 < D:
            if j > 0:
                r = A[..., j + 1:, j] - jnp.einsum(
                    "...k,...ik->...i", L[..., j, :j], L[..., j + 1:, :j])
            else:
                r = A[..., j + 1:, j]
            L = L.at[..., j + 1:, j].set(r / ljj[..., None])
    return L


def cholesky_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given L = chol(A). b [..., D] → x [..., D]."""
    D = L.shape[-1]
    # forward: L y = b
    y = jnp.zeros_like(b)
    for i in range(D):
        if i > 0:
            s = b[..., i] - jnp.einsum("...k,...k->...",
                                       L[..., i, :i], y[..., :i])
        else:
            s = b[..., i]
        y = y.at[..., i].set(s / L[..., i, i])
    # backward: Lᵀ x = y
    x = jnp.zeros_like(b)
    for i in reversed(range(D)):
        if i + 1 < D:
            s = y[..., i] - jnp.einsum("...k,...k->...",
                                       L[..., i + 1:, i], x[..., i + 1:])
        else:
            s = y[..., i]
        x = x.at[..., i].set(s / L[..., i, i])
    return x


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = A⁻¹ b for batched SPD A [..., D, D], b [..., D]."""
    return cholesky_solve(cholesky_factor(A), b)


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched 3×3 matrices (inertia tensors)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    inv = jnp.stack([
        jnp.stack([co00, co01, co02], -1),
        jnp.stack([co10, co11, co12], -1),
        jnp.stack([co20, co21, co22], -1),
    ], -2)
    return inv / det[..., None, None]
