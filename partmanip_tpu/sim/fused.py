"""Fused Pallas inner physics step — the TPU speed-of-light path.

One ``pallas_call`` executes the ENTIRE inner substep (FK → Jacobians → mass
matrices → sphere×box narrowphase → penalty + stick-slip anchor contacts →
two-pass implicit PD solves → integration) for a block of envs resident in
VMEM, replacing the ~200-fusion XLA graph of :mod:`engine` whose [E, S, G, 3]
candidate tensors tile-pad 42× on the minor dims and go HBM-bound
(measured 18 ms/inner-step @4096 envs; see CLAUDE.md "State of play").

Layout: the env axis is the *vector lane* axis.  Every per-env scalar is an
(R, 128) tile (R ≤ 8 sublanes); per-feature quantities stack feature axes in
front — a sphere×box candidate field is [S, G, R, 128] and every VPU
instruction processes full (8,128) tiles of independent envs.  Components of
vectors/quaternions are stacked first ([3, ...], [4, ...]) and indexed
statically.  No gathers: per-env topology (GAPartNet objects) is resolved by
masked sums over the (small, static) link axis; the robot spec is embedded as
trace-time numpy constants.

Semantics replicate :func:`engine._inner_step` exactly (same formulas, same
partner-selection order, same impulse budgeting) — parity-tested against it
in ``tests/test_fused.py``.  Restrictions (fall back to the reference engine
otherwise): ``coriolis=False``, robot/free-body specs shared across envs
(env axis 1), all-zero gravity scale on the trees, num_envs % 128 == 0.

Reference boundary: ≙ the PhysX ``gym.simulate`` call
(``tasks/hand_base.py:282-284``) — the hot loop the reference outsources to
CUDA; here it is a single Mosaic kernel.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import contact as contact_lib
from .types import SimParams

LANE = 128


# ======================================================================
# small-vector math on component-first stacked arrays
#   vec3: [3, ...tile], quat: [4, ...tile] (xyzw)
# ======================================================================

def _is_static(v):
    """Constant vec/quat = python tuple of floats (folds into scalar
    literals inside Pallas kernels — jaxpr array consts are rejected)."""
    return isinstance(v, tuple)


def _build(comps):
    if all(isinstance(c, float) for c in comps):
        return tuple(comps)
    return jnp.stack(comps)


def _cross(a, b):
    return _build([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vadd(a, b):
    if not _is_static(a) and not _is_static(b):
        return a + b
    return _build([a[i] + b[i] for i in range(3)])


def _vsub(a, b):
    if not _is_static(a) and not _is_static(b):
        return a - b
    return _build([a[i] - b[i] for i in range(3)])


def _vscale(v, s):
    """v (vec) × s (scalar / traced scalar array)."""
    if not _is_static(v) and isinstance(s, float):
        return v * s
    return _build([v[i] * s for i in range(3)])


def _qmul(q, p):
    """Hamilton product, xyzw (≙ ops.rotations.quat_mul)."""
    x1, y1, z1, w1 = q[0], q[1], q[2], q[3]
    x2, y2, z2, w2 = p[0], p[1], p[2], p[3]
    return _build([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])


def _qrot(q, v):
    """Rotate vec3 by quat: v + 2 q_w (q_v × v) + 2 q_v × (q_v × v)."""
    qv = (q[0], q[1], q[2]) if _is_static(q) else q[:3]
    t = _cross(qv, v)
    t = _build([t[i] + t[i] for i in range(3)])
    return _vadd(_vadd(v, _vscale(t, q[3])), _cross(qv, t))


def _qrot_inv(q, v):
    qv = ((-q[0], -q[1], -q[2]) if _is_static(q)
          else (-q[0], -q[1], -q[2]))
    t = _cross(qv, v)
    t = _build([t[i] + t[i] for i in range(3)])
    return _vadd(_vadd(v, _vscale(t, q[3])), _cross(qv, t))


def _qmat(q):
    """Quat → 3×3 rotation as nested python lists R[a][b] of tiles."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return [
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ]


def _compose(p1, q1, p2, q2):
    """(p1,q1) ∘ (p2,q2): child pose in world given parent pose."""
    return _vadd(p1, _qrot(q1, p2)), _qmul(q1, q2)


def _norm(v, eps=0.0):
    return jnp.sqrt(_dot(v, v) + eps)


# ======================================================================
# batched small SPD solves on [D, D, tile] stacks (unrolled Cholesky,
# ≙ ops.linalg.spd_solve in env-lane layout)
# ======================================================================

def _chol_tiled(A):
    """A: [D, D, R, C] → lower-tri factor as nested lists of tiles."""
    D = A.shape[0]
    L = [[None] * D for _ in range(D)]
    inv_d = [None] * D
    for j in range(D):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        ljj = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv = 1.0 / ljj
        L[j][j] = ljj
        inv_d[j] = inv
        for i in range(j + 1, D):
            r = A[i, j]
            for k in range(j):
                r = r - L[i][k] * L[j][k]
            L[i][j] = r * inv
    return L, inv_d


def _chol_solve_tiled(L, inv_d, b):
    """Solve A x = b given (L, 1/diag). b: [D, R, C] → x [D, R, C]."""
    D = len(L)
    y = [None] * D
    for i in range(D):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv_d[i]
    x = [None] * D
    for i in reversed(range(D)):
        s = y[i]
        for k in range(i + 1, D):
            s = s - L[k][i] * x[k]
        x[i] = s * inv_d[i]
    return jnp.stack(x)


def _spd_solve_tiled(A, b):
    L, inv_d = _chol_tiled(A)
    return _chol_solve_tiled(L, inv_d, b)


def _inv3_tiled(A):
    """Closed-form inverse of a 3×3 given as nested lists of tiles."""
    a, b, c = A[0]
    d, e, f = A[1]
    g, h, i = A[2]
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
    inv = 1.0 / det
    return [[co00 * inv, co01 * inv, co02 * inv],
            [co10 * inv, co11 * inv, co12 * inv],
            [co20 * inv, co21 * inv, co22 * inv]]


# ======================================================================
# generic articulation math (static numpy spec OR per-env tiled spec)
# ======================================================================

def _c3(v):
    """numpy [3] constant → python-float tuple (scalar literals in-kernel;
    Pallas rejects captured array constants)."""
    v = np.asarray(v, np.float64).reshape(-1)
    return (float(v[0]), float(v[1]), float(v[2]))


def _c4(v):
    v = np.asarray(v, np.float64).reshape(-1)
    return (float(v[0]), float(v[1]), float(v[2]), float(v[3]))


def _const_arr(arr, R, C):
    """numpy constant [*shape] → traced [*shape, R, C] array, materialized
    from scalar literals (jnp.full) so no jaxpr constant is captured.
    One full per *unique* value (masks are mostly 0/1) keeps the op count —
    and hence Mosaic/XLA compile time — small."""
    a = np.asarray(arr, np.float64)
    flat = a.reshape(-1)
    uniq = {}
    for v in flat:
        fv = float(v)
        if fv not in uniq:
            uniq[fv] = jnp.full((R, C), fv, jnp.float32)
    out = jnp.stack([uniq[float(v)] for v in flat])
    return out.reshape(a.shape + (R, C)) if a.ndim != 1 else out


class TreeArgs(NamedTuple):
    """One articulation's spec, either static numpy (robot — arrays without
    the env axis) or per-env tiled jnp (objects — [L/D, (k,), R, C])."""

    static: bool
    parent: Any       # [L] i  |  [L, R, C] i32
    joint_type: Any
    origin_pos: Any   # [L, 3] |  [L, 3, R, C]
    origin_quat: Any
    axis: Any
    dof_idx: Any
    link_mask: Any
    mass: Any
    com: Any
    inertia: Any      # [L, 3, 3] | [L, 3, 3, R, C]
    dof_child: Any    # [D]
    dof_mask: Any
    lower: Any
    upper: Any
    vel_limit: Any
    effort: Any
    armature: Any
    damping: Any
    friction: Any
    kp: Any
    kd: Any
    ancestor: Any     # [L, D] | [L, D, R, C]

    @property
    def L(self):
        return (self.parent.shape[0])

    @property
    def D(self):
        return (self.dof_mask.shape[0])

    def lvec(self, name, l):
        a = getattr(self, name)
        return _c3(a[l]) if self.static else a[l]

    def lquat(self, l):
        a = self.origin_quat
        return _c4(a[l]) if self.static else a[l]

    def lsca(self, name, l):
        a = getattr(self, name)
        return float(a[l]) if self.static else a[l]

    def dvec_stack(self, name, like):
        """[D]-field as a traced [D, R, C] array (materialized from scalar
        literals when static). ``like``: any traced [..., R, C] array."""
        a = getattr(self, name)
        if self.static:
            R, C = like.shape[-2:]
            return _const_arr(a, R, C)
        return a


def tree_fk(ta: TreeArgs, qpos, root_p, root_q):
    """FK sweep → (link_p, link_q) python lists + per-dof world axis/anchor.

    qpos: [D, R, C]; root_p: [3, R, C]; root_q: [4, R, C].
    ≙ kinematics.forward_kinematics in env-lane layout.
    """
    Lh, D = ta.L, ta.D
    link_p, link_q = [None] * Lh, [None] * Lh
    p0, q0 = _compose(root_p, root_q, ta.lvec("origin_pos", 0), ta.lquat(0))
    link_p[0], link_q[0] = p0, q0

    for l in range(1, Lh):
        if ta.static:
            pi = max(int(ta.parent[l]), 0)
            pp, pq = link_p[pi], link_q[pi]
        else:
            pp = jnp.zeros_like(root_p)
            pq = jnp.zeros_like(root_q)
            pl_ = ta.parent[l]
            for lp in range(l):
                m = (pl_ == lp).astype(root_p.dtype)
                pp = pp + m * link_p[lp]
                pq = pq + m * link_q[lp]
            # padded links (parent −1) inherit the root pose (harmless:
            # link_mask zeroes their dynamics)
            m_pad = (pl_ < 0).astype(root_p.dtype)
            pp = pp + m_pad * link_p[0]
            pq = pq + m_pad * link_q[0]
        jp, jqw = _compose(pp, pq, ta.lvec("origin_pos", l), ta.lquat(l))
        # joint coordinate of this link
        if ta.static and int(ta.joint_type[l]) == 0:
            # fixed joint: pure frame composition (compile-time pruning)
            link_p[l], link_q[l] = jp, jqw
            continue
        if ta.static:
            q_l = qpos[int(ta.dof_idx[l])]
            jt = int(ta.joint_type[l])
            is_rev = float(jt == 1)
            is_pris = float(jt == 2)
        else:
            q_l = jnp.zeros_like(qpos[0])
            di = ta.dof_idx[l]
            for d in range(D):
                q_l = q_l + (di == d).astype(qpos.dtype) * qpos[d]
            jt = ta.joint_type[l]
            is_rev = (jt == 1).astype(qpos.dtype)
            is_pris = (jt == 2).astype(qpos.dtype)
        ax = ta.lvec("axis", l)
        ang = q_l * is_rev
        half = 0.5 * ang
        s = jnp.sin(half)
        jq = jnp.stack([ax[0] * s, ax[1] * s, ax[2] * s, jnp.cos(half)])
        jt_vec = _vscale(ax, q_l * is_pris)
        link_p[l] = _vadd(jp, _qrot(jqw, jt_vec))
        link_q[l] = _qmul(jqw, jq)

    # per-dof world axis / anchor at the dof's child link
    dof_axis, dof_anchor = [], []
    for d in range(D):
        if ta.static:
            c = int(ta.dof_child[d])
            cq, cp = link_q[c], link_p[c]
            ax = ta.lvec("axis", c)
        else:
            cq = jnp.zeros_like(root_q)
            cp = jnp.zeros_like(root_p)
            ax = jnp.zeros_like(root_p)
            dc = ta.dof_child[d]
            for l in range(Lh):
                m = (dc == l).astype(root_p.dtype)
                cq = cq + m * link_q[l]
                cp = cp + m * link_p[l]
                ax = ax + m * ta.lvec("axis", l)
        dof_axis.append(_qrot(cq, ax))
        dof_anchor.append(cp)
    axis_w = jnp.stack(dof_axis)      # [D, 3, R, C]
    anchor_w = jnp.stack(dof_anchor)  # [D, 3, R, C]
    return link_p, link_q, axis_w, anchor_w


def _dof_kind(ta: TreeArgs, like):
    """rev/pris indicator per dof as traced [D, R, C] arrays."""
    D = ta.D
    if ta.static:
        R, C = like.shape[-2:]
        kind = np.asarray(ta.joint_type)[np.asarray(ta.dof_child)]
        dm = np.asarray(ta.dof_mask, np.float32)
        rev = _const_arr((kind == 1) * dm, R, C)
        pris = _const_arr((kind == 2) * dm, R, C)
        return rev, pris
    kind = []
    for d in range(D):
        k = jnp.zeros_like(like[0])
        dc = ta.dof_child[d]
        for l in range(ta.L):
            k = k + (dc == l).astype(like.dtype) * ta.joint_type[l].astype(like.dtype)
        kind.append(k)
    kind = jnp.stack(kind)
    dm = ta.dof_mask
    rev = (kind == 1).astype(like.dtype) * dm
    pris = (kind == 2).astype(like.dtype) * dm
    return rev, pris


def point_jacobian_tiled(ta: TreeArgs, axis_w, anchor_w, points, anc_pd):
    """Linear Jacobian of attached points. points: [3, P, R, C];
    anc_pd: ancestor mask [P, D] numpy or [P, D, R, C] tiled.
    Returns [3, P, D, R, C]."""
    rev, pris = _dof_kind(ta, points[0])
    # axis_w/anchor_w: [D, 3, R, C] → component-first [3, 1, D, R, C]
    ax = jnp.moveaxis(axis_w, 0, 1)[:, None]         # [3, 1, D, R, C]
    an = jnp.moveaxis(anchor_w, 0, 1)[:, None]
    r = points[:, :, None] - an                      # [3, P, D, R, C]
    jv = _cross(ax, r) * rev[None, None] + ax * pris[None, None]
    if isinstance(anc_pd, np.ndarray):
        R, C = points.shape[-2:]
        anc = _const_arr(anc_pd, R, C)
    else:
        anc = anc_pd
    return jv * anc[None]


def tree_link_jacobians(ta: TreeArgs, link_p, link_q, axis_w, anchor_w):
    """jv, jw [3, L, D, R, C] at link COMs + com_w [3, L, R, C]."""
    com_w = jnp.stack([
        _vadd(link_p[l], _qrot(link_q[l], ta.lvec("com", l)))
        for l in range(ta.L)
    ], axis=1)                                        # [3, L, R, C]
    rev, pris = _dof_kind(ta, com_w[0])
    ax = jnp.moveaxis(axis_w, 0, 1)[:, None]          # [3, 1, D, R, C]
    an = jnp.moveaxis(anchor_w, 0, 1)[:, None]
    r = com_w[:, :, None] - an                        # [3, L, D, R, C]
    if ta.static:
        R, C = com_w.shape[-2:]
        anc = _const_arr(ta.ancestor, R, C)[None]
    else:
        anc = ta.ancestor[None]
    jv = (_cross(ax, r) * rev[None, None] + ax * pris[None, None]) * anc
    jw = ax * rev[None, None] * anc
    return jv, jw, com_w


def tree_mass_matrix(ta: TreeArgs, link_q, jv, jw):
    """Joint-space inertia [D, D, R, C] (+armature, padded-dof identity).
    ≙ dynamics.mass_matrix."""
    Lh, D = ta.L, ta.D
    # world inertia per link: Iw = R I Rᵀ, as nested lists over links
    Iw = []  # [l][a][b] tiles
    for l in range(Lh):
        R = _qmat(link_q[l])
        I_l = ta.inertia[l]  # [3,3] np or [3,3,R,C]
        rows = []
        for a in range(3):
            row = []
            for b in range(3):
                s = None
                for k in range(3):
                    for m in range(3):
                        if ta.static:
                            c = float(I_l[k, m])
                            if c == 0.0:
                                continue
                            t = R[a][k] * (c * R[b][m])
                        else:
                            t = R[a][k] * (I_l[k, m] * R[b][m])
                        s = t if s is None else s + t
                if s is None:
                    s = jnp.zeros_like(R[0][0])
                row.append(s)
            rows.append(row)
        Iw.append(rows)

    if ta.static:
        R, C = jv.shape[-2:]
        mass = _const_arr(np.asarray(ta.mass) * np.asarray(ta.link_mask),
                          R, C)
    else:
        mass = ta.mass * ta.link_mask
    # u[c][f] = Σ_b Iw[c,b]·jw[b, :, f] stacked over links: [3, L, D, R, C]
    u = []
    for c in range(3):
        s = None
        for b in range(3):
            Iw_cb = jnp.stack([Iw[l][c][b] for l in range(Lh)])  # [L, R, C]
            t = Iw_cb[:, None] * jw[b]
            s = t if s is None else s + t
        u.append(s)

    rows = [[None] * D for _ in range(D)]
    for d in range(D):
        for f in range(d + 1):
            lin = (jv[0][:, d] * jv[0][:, f] + jv[1][:, d] * jv[1][:, f]
                   + jv[2][:, d] * jv[2][:, f])
            ang = (jw[0][:, d] * u[0][:, f] + jw[1][:, d] * u[1][:, f]
                   + jw[2][:, d] * u[2][:, f])
            m_df = jnp.sum(mass * lin + ang, axis=0)
            rows[d][f] = m_df
            rows[f][d] = m_df
    dm = ta.dvec_stack("dof_mask", jv)
    arm = ta.dvec_stack("armature", jv)
    diag = arm * dm + (1.0 - dm)
    for d in range(D):
        rows[d][d] = rows[d][d] + diag[d]
    return jnp.stack([jnp.stack(r) for r in rows])    # [D, D, R, C]


def tree_step(ta: TreeArgs, M, JtNJ, qpos, qvel, targets, tau_ext, h):
    """Two-pass implicit effort-clamped PD solve + integration.
    ≙ dynamics.step_tree with bias ≡ 0 (gravity_scale 0, coriolis off).

    M, JtNJ: [D, D, R, C]; qpos/qvel/targets/tau_ext: [D, R, C].
    Returns (qpos', qvel').
    """
    D = ta.D
    dm = ta.dvec_stack("dof_mask", qpos)
    kp = ta.dvec_stack("kp", qpos)
    kd = ta.dvec_stack("kd", qpos)
    effort = ta.dvec_stack("effort", qpos)
    fric = ta.dvec_stack("friction", qpos)
    damping = ta.dvec_stack("damping", qpos)
    veps = 1e-3  # dynamics._FRICTION_VEPS

    tau_d0 = kp * (targets - qpos - h * qvel) - kd * qvel
    tau_fric = -fric * jnp.clip(qvel / veps, -1.0, 1.0)
    d_fric = fric / veps * (jnp.abs(qvel) < veps)

    A_base = M + JtNJ

    def assemble(unsat, b_extra=None):
        diag = (h * (kd * unsat + (0.0 if b_extra is None else b_extra)
                     + damping + d_fric)
                + (h * h) * (kp * unsat)) * dm
        return jnp.stack([
            jnp.stack([A_base[d, d] + diag[d] if f == d else A_base[d, f]
                       for f in range(D)])
            for d in range(D)])

    ones = jnp.ones_like(qpos)
    rhs1 = (tau_d0 + tau_fric + tau_ext) * dm
    qacc1 = _spd_solve_tiled(assemble(ones), rhs1) * dm
    tau_imp = tau_d0 - (h * h * kp + h * kd) * qacc1
    sat = (jnp.abs(tau_imp) > effort).astype(qpos.dtype)
    unsat = 1.0 - sat

    # Saturated dofs: implicit effort-limited velocity servo toward the
    # time-optimal approach speed (see dynamics.step_tree for the full
    # derivation — this emulates PhysX TGS's intra-substep drive
    # re-linearization without the velocity chatter of an explicit
    # deadbeat gain).
    vel_lim = ta.dvec_stack("vel_limit", qpos)
    M_diag = jnp.stack([M[d, d] for d in range(D)])
    a_max = effort / jnp.maximum(M_diag, 1e-9)
    err = targets - qpos
    v_opt = jnp.sign(err) * jnp.minimum(
        vel_lim, jnp.minimum(jnp.abs(err) / h,
                             jnp.sqrt(2.0 * 0.25 * a_max * jnp.abs(err))))
    dv = v_opt - qvel
    b_imp = sat * effort / jnp.maximum(jnp.abs(dv), 1e-2)
    tau_drive = b_imp * dv + unsat * tau_d0
    rhs = (tau_drive + tau_fric + tau_ext) * dm
    qacc = _spd_solve_tiled(assemble(unsat, b_imp), rhs) * dm

    lower = ta.dvec_stack("lower", qpos)
    upper = ta.dvec_stack("upper", qpos)
    qv_new = jnp.clip(qvel + h * qacc, -vel_lim, vel_lim)
    q_new = qpos + h * qv_new
    q_cl = jnp.clip(q_new, lower, upper)
    at_lo = (q_new < lower) & (qv_new < 0)
    at_hi = (q_new > upper) & (qv_new > 0)
    qv_new = jnp.where(at_lo | at_hi, 0.0, qv_new) * dm
    return q_cl * dm, qv_new


# ======================================================================
# contacts (≙ sim.contact in env-lane layout)
# ======================================================================

def _box_sdf_tiled(p, half):
    """p, half: [3, ...]; returns (dist [...], normal [3, ...])."""
    q = jnp.abs(p) - half
    q_out = jnp.maximum(q, 0.0)
    d_out = jnp.sqrt(q_out[0] ** 2 + q_out[1] ** 2 + q_out[2] ** 2)
    qmax = jnp.maximum(jnp.maximum(q[0], q[1]), q[2])
    d_in = jnp.minimum(qmax, 0.0)
    dist = d_out + d_in

    sgn = jnp.where(p >= 0, 1.0, -1.0)
    n_out = sgn * q_out / jnp.maximum(d_out, 1e-9)
    inside_face = (q == qmax[None]).astype(p.dtype)
    n_in = sgn * inside_face
    n_in = n_in / jnp.maximum(
        jnp.sqrt(n_in[0] ** 2 + n_in[1] ** 2 + n_in[2] ** 2), 1e-9)
    outside = (d_out > 0)[None]
    normal = jnp.where(outside, n_out, n_in)
    return dist, normal


def _penalty(depth, normal, v_self, v_other, active, friction, p: SimParams,
             m_eff, contact_axes, recede_damp: float = 0.0):
    """≙ contact.penalty_forces. All arrays [..., R, C]; normal/v [3, ...].
    contact_axes: axes of the per-body contact set (for the n_act budget).
    Returns (force [3, ...], fn, touching)."""
    kn, h = p.contact_kn, p.h
    cd = float(2.0 * p.contact_damping_ratio * np.sqrt(kn * m_eff))
    v_rel = v_self - v_other
    vn = _dot(v_rel, normal)
    vt = v_rel - vn[None] * normal
    vt_norm = _norm(vt)

    touching = (depth < 0.0).astype(depth.dtype) * active
    n_act = jnp.maximum(1.0, jnp.sum(touching, axis=contact_axes,
                                     keepdims=True))
    m_c = m_eff / n_act
    depth_pred = depth + h * vn
    # separation-speed-aware depenetration budget (≙ contact.penalty_forces:
    # caps TOTAL depenetration velocity like PhysX, not a per-step increment)
    depen_budget = jnp.maximum(
        0.0, p.max_depenetration_velocity - jnp.maximum(vn, 0.0))
    fn_spring = jnp.minimum(
        jnp.maximum(0.0, -kn * jnp.minimum(depth, depth_pred)),
        m_c * depen_budget / h)
    approach = jnp.maximum(0.0, -vn)
    fn_damp = jnp.minimum(cd * approach, m_c * approach / h)
    # recede damping for free-body contacts (≙ contact.penalty_forces):
    # restitution → 0 so a pinched cube cannot chatter at ±max_depen
    recede = jnp.maximum(0.0, vn)
    fn_rec = recede_damp * jnp.minimum(cd * recede, m_c * recede / h)
    fn = jnp.maximum(0.0, fn_spring + fn_damp - fn_rec) * touching
    ft_mag = jnp.minimum(
        jnp.minimum(friction * fn, p.contact_kt * vt_norm),
        m_c * vt_norm / h)
    ft = -ft_mag[None] * vt / jnp.maximum(vt_norm, 1e-6)[None]
    force = fn[None] * normal + ft
    return force, fn, touching


def _imp_coef(touching, m_eff, p: SimParams):
    h = p.h
    cd = float(2.0 * p.contact_damping_ratio * np.sqrt(p.contact_kn * m_eff))
    return touching * (h * cd + h * h * p.contact_kn)


class Best(NamedTuple):
    """Per-sphere best contact partner (stick-anchor bookkeeping)."""

    depth: jnp.ndarray    # [S, R, C]
    pid: jnp.ndarray      # i32 [S, R, C]; 0 ground, 1 cube, 2+g box g
    normal: jnp.ndarray   # [3, S, R, C]
    fn: jnp.ndarray
    mu: jnp.ndarray
    touch: jnp.ndarray
    pvel: jnp.ndarray     # [3, S, R, C]

    def consider(self, depth, pid, normal, fn, mu, touch, pvel):
        better = (depth < self.depth) & (touch > 0)
        bf = better.astype(depth.dtype)
        return Best(
            depth=jnp.where(better, depth, self.depth),
            pid=jnp.where(better, pid, self.pid),
            normal=jnp.where(better[None], normal, self.normal),
            fn=jnp.where(better, fn, self.fn),
            mu=jnp.where(better, mu, self.mu),
            touch=jnp.maximum(self.touch, touch * bf),
            pvel=jnp.where(better[None], pvel, self.pvel),
        )


def init_best(S, R, C):
    z = jnp.zeros((S, R, C), jnp.float32)
    return Best(depth=jnp.full((S, R, C), 1e9, jnp.float32),
                pid=jnp.full((S, R, C), -1, jnp.int32),
                normal=jnp.zeros((3, S, R, C), jnp.float32),
                fn=z, mu=z, touch=z, pvel=jnp.zeros((3, S, R, C),
                                                    jnp.float32))


def frame_jw_tiled(ta: TreeArgs, axis_w, points_like, anc_pd):
    """Angular Jacobian rows for attached frames: [3, P, D, R, C]."""
    rev, _ = _dof_kind(ta, points_like)
    ax = jnp.moveaxis(axis_w, 0, 1)[:, None]
    if isinstance(anc_pd, np.ndarray):
        anc = anc_pd.reshape(anc_pd.shape[0], anc_pd.shape[1], 1, 1)
    else:
        anc = anc_pd
    return ax * rev[None, None] * anc[None]


# ======================================================================
# the fused inner step (pure jnp over tiled arrays — callable outside
# pallas for tests; the kernel below just loads/stores around it)
# ======================================================================

class FusedMeta(NamedTuple):
    """Static (trace-time) scene description for the kernel closure."""

    params: SimParams
    robot: TreeArgs            # static=True, numpy
    spheres: Any               # numpy SphereGeoms
    sphere_anc: np.ndarray     # [S, Dr] ancestor mask at sphere links
    fb: Any                    # numpy FreeBodySpec fields or None
    has_obj: bool
    has_body: bool
    Lo: int = 0
    Do: int = 0
    G: int = 0                 # total object geoms = boxes + grid geoms
    n_grid: int = 0            # trailing n_grid slots of the G axis are
    #                            baked-SDF mesh geoms: their narrowphase
    #                            (depth/normal/active) is computed OUTSIDE
    #                            the kernel (XLA trilinear gathers, which
    #                            Mosaic cannot express per-lane) and fed in
    #                            as per-step inputs; poses, Jacobians,
    #                            reactions and anchors reuse the box path


OBJ_STATE_KEYS = ("oq", "ov", "orp", "orq")
BODY_STATE_KEYS = ("bpos", "bquat", "blin", "bang")
OBJ_SPEC_KEYS = (
    "o_parent", "o_joint_type", "o_origin_pos", "o_origin_quat", "o_axis",
    "o_dof_idx", "o_link_mask", "o_mass", "o_com", "o_inertia",
    "o_dof_child", "o_dof_mask", "o_lower", "o_upper", "o_vel_limit",
    "o_effort", "o_armature", "o_damping", "o_friction", "o_kp", "o_kd",
    "o_ancestor", "b_link", "b_pos", "b_quat", "b_half", "b_mask", "b_mu",
)


def _obj_args(inp) -> TreeArgs:
    return TreeArgs(
        static=False, parent=inp["o_parent"], joint_type=inp["o_joint_type"],
        origin_pos=inp["o_origin_pos"], origin_quat=inp["o_origin_quat"],
        axis=inp["o_axis"], dof_idx=inp["o_dof_idx"],
        link_mask=inp["o_link_mask"], mass=inp["o_mass"], com=inp["o_com"],
        inertia=inp["o_inertia"], dof_child=inp["o_dof_child"],
        dof_mask=inp["o_dof_mask"], lower=inp["o_lower"],
        upper=inp["o_upper"], vel_limit=inp["o_vel_limit"],
        effort=inp["o_effort"], armature=inp["o_armature"],
        damping=inp["o_damping"], friction=inp["o_friction"],
        kp=inp["o_kp"], kd=inp["o_kd"], ancestor=inp["o_ancestor"])


def _inner_step_tiled(meta: FusedMeta, inp):
    """One inner substep on a tile of envs. inp: dict of [*, R, C] arrays
    (see fused_physics_step for the packing). Returns the new-state dict."""
    p = meta.params
    h = float(p.h)
    rt = meta.robot
    sph = meta.spheres
    S = sph.link_idx.shape[0]
    rq, rv = inp["rq"], inp["rv"]
    R, C = rq.shape[-2:]
    f32 = rq.dtype

    # ---- robot kinematics / inertia ----
    link_p, link_q, axis_w, anchor_w = tree_fk(rt, rq, inp["rrp"],
                                               inp["rrq"])
    jv_r, jw_r, _ = tree_link_jacobians(rt, link_p, link_q, axis_w, anchor_w)
    M_r = tree_mass_matrix(rt, link_q, jv_r, jw_r)

    centers = jnp.stack(
        [_vadd(link_p[int(sph.link_idx[s])],
               _qrot(link_q[int(sph.link_idx[s])], _c3(sph.offset[s])))
         for s in range(S)], axis=1)                   # [3, S, R, C]
    Jp = point_jacobian_tiled(rt, axis_w, anchor_w, centers,
                              meta.sphere_anc)         # [3, S, Dr, R, C]
    v_s = jnp.sum(Jp * rv[None, None], axis=2)         # [3, S, R, C]

    radii = _const_arr(sph.radius, R, C)               # [S, R, C]
    mu_s = _const_arr(sph.friction, R, C)
    sticky = _const_arr(sph.sticky, R, C)

    F_sph = jnp.zeros((3, S, R, C), f32)
    N = [[jnp.zeros((S, R, C), f32) for _ in range(3)] for _ in range(3)]
    best = init_best(S, R, C)
    zero3 = jnp.zeros((3, S, R, C), f32)

    # ---- 1) spheres vs ground (plane friction 0.1, hand_base.py:123-129) --
    depth_g = centers[2] - radii
    n_g = jnp.concatenate([jnp.zeros((2, S, R, C), f32),
                           jnp.ones((1, S, R, C), f32)])
    mu_g = 0.5 * (mu_s + 0.1)
    f_g, fn_g, t_g = _penalty(depth_g, n_g, v_s, 0.0, 1.0,
                              mu_g, p, 0.5, (0,))
    F_sph = F_sph + f_g
    N[2][2] = N[2][2] + _imp_coef(t_g, 0.5, p)
    best = best.consider(depth_g, jnp.int32(0), n_g, fn_g,
                         mu_g * jnp.ones_like(fn_g), t_g, zero3)

    # ---- 2) spheres vs free body (cube) ----
    cube_f = cube_t = None
    if meta.has_body:
        fb = meta.fb
        m_cube = float(np.asarray(fb.mass).reshape(-1)[0])
        mu_cube = float(np.asarray(fb.friction).reshape(-1)[0])
        half_c = _const_arr(np.asarray(fb.half_extents).reshape(3),
                            R, C)[:, None]             # [3, 1, R, C]
        bp_, bq_ = inp["bpos"], inp["bquat"]
        rel = centers - bp_[:, None]
        p_loc = _qrot_inv(bq_[:, None], rel)
        dist, n_loc = _box_sdf_tiled(p_loc, half_c)
        n_w = _qrot(bq_[:, None], n_loc)
        depth_b = dist - radii
        v_cube = (inp["blin"][:, None]
                  + _cross(inp["bang"][:, None], rel))
        mu_b = 0.5 * (mu_s + mu_cube)
        f_b, fn_b, t_b = _penalty(depth_b, n_w, v_s, v_cube, 1.0,
                                  mu_b, p, m_cube, (0,), recede_damp=1.0)
        F_sph = F_sph + f_b
        imp_b = _imp_coef(t_b, m_cube, p)
        for a in range(3):
            for b in range(a, 3):
                nn = imp_b * n_w[a] * n_w[b]
                N[a][b] = N[a][b] + nn
                if b != a:
                    N[b][a] = N[b][a] + nn
        cube_f = -jnp.sum(f_b, axis=1)
        cube_t = -jnp.sum(_cross(rel, f_b), axis=1)
        best = best.consider(depth_b, jnp.int32(1), n_w, fn_b,
                             mu_b * jnp.ones_like(fn_b), t_b, v_cube)

    # ---- 3) spheres vs articulated-object boxes ----
    tau_o = None
    if meta.has_obj:
        ot = _obj_args(inp)
        Do, G = meta.Do, meta.G
        olink_p, olink_q, oaxis_w, oanchor_w = tree_fk(
            ot, inp["oq"], inp["orp"], inp["orq"])
        # world box poses via masked link gather
        bpw_l, bqw_l, anc_box_l = [], [], []
        b_pos = jnp.moveaxis(inp["b_pos"], 1, 0)     # [3, G, R, C]
        b_quat = jnp.moveaxis(inp["b_quat"], 1, 0)   # [4, G, R, C]
        for g in range(G):
            lp = jnp.zeros((3, R, C), f32)
            lq = jnp.zeros((4, R, C), f32)
            anc_g = []
            bl = inp["b_link"][g]
            for l in range(meta.Lo):
                m = (bl == l).astype(f32)
                lp = lp + m * olink_p[l]
                lq = lq + m * olink_q[l]
            for d in range(Do):
                a = jnp.zeros((R, C), f32)
                for l in range(meta.Lo):
                    a = a + (bl == l).astype(f32) * inp["o_ancestor"][l, d]
                anc_g.append(a)
            gp, gq = _compose(lp, lq, b_pos[:, g], b_quat[:, g])
            bpw_l.append(gp)
            bqw_l.append(gq)
            anc_box_l.append(jnp.stack(anc_g))
        bpw = jnp.stack(bpw_l, axis=1)               # [3, G, R, C]
        bqw = jnp.stack(bqw_l, axis=1)               # [4, G, R, C]
        anc_box = jnp.stack(anc_box_l)               # [G, Do, R, C]

        Jv_box = point_jacobian_tiled(ot, oaxis_w, oanchor_w, bpw, anc_box)
        Jw_box = frame_jw_tiled(ot, oaxis_w, bpw[0], anc_box)
        ov = inp["ov"]
        v_bc = jnp.sum(Jv_box * ov[None, None], axis=2)   # [3, G, R, C]
        w_b = jnp.sum(Jw_box * ov[None, None], axis=2)

        rel_o = centers[:, :, None] - bpw[:, None]        # [3, S, G, R, C]
        if meta.n_grid:
            # baked-SDF geoms ride the tail of the G axis with externally
            # computed narrowphase (see fused_physics_step /
            # _grid_narrowphase; ≙ engine 3b).  The penalty budget (n_act)
            # is computed per contact *set* — boxes and grids separately —
            # matching the two penalty_forces calls in engine._inner_step.
            Gb = G - meta.n_grid                          # analytic boxes
            p_loc = _qrot_inv(bqw[:, None, :Gb], rel_o[:, :, :Gb])
            half_o = jnp.moveaxis(inp["b_half"], 1, 0)[:, None, :Gb]
            dist, n_loc = _box_sdf_tiled(p_loc, half_o)
            n_box = _qrot(bqw[:, None, :Gb], n_loc)       # [3, S, Gb, R, C]
            depth_box = dist - radii[:, None]
            v_other = v_bc[:, None] + _cross(w_b[:, None], rel_o)
            mu_o = 0.5 * (mu_s[:, None] + inp["b_mu"][None])
            depth_o = jnp.concatenate([depth_box, inp["g_depth"]], axis=1)
            n_o = jnp.concatenate([n_box, inp["g_normal"]], axis=2)
            act_box = jnp.broadcast_to(inp["b_mask"][None, :Gb],
                                       depth_box.shape)
            act_grid = inp["b_mask"][None, Gb:] * inp["g_active"]
            f_bx, fn_bx, t_bx = _penalty(
                depth_box, n_box, v_s[:, :, None], v_other[:, :, :Gb],
                act_box, mu_o[:, :Gb], p, 0.3, (0, 1))
            f_gr, fn_gr, t_gr = _penalty(
                inp["g_depth"], inp["g_normal"], v_s[:, :, None],
                v_other[:, :, Gb:], act_grid, mu_o[:, Gb:], p, 0.3, (0, 1))
            f_o = jnp.concatenate([f_bx, f_gr], axis=2)
            fn_o = jnp.concatenate([fn_bx, fn_gr], axis=1)
            t_o = jnp.concatenate([t_bx, t_gr], axis=1)
        else:
            # no-grid path: keep this jaxpr IDENTICAL to the pre-grid
            # kernel (XLA:CPU interpret compiles of this graph take ~1 h
            # on the CI host and are cached by HLO fingerprint)
            p_loc = _qrot_inv(bqw[:, None], rel_o)
            half_o = jnp.moveaxis(inp["b_half"], 1, 0)[:, None]
            dist, n_loc = _box_sdf_tiled(p_loc, half_o)
            n_o = _qrot(bqw[:, None], n_loc)              # [3, S, G, R, C]
            depth_o = dist - radii[:, None]
            v_other = v_bc[:, None] + _cross(w_b[:, None], rel_o)
            mu_o = 0.5 * (mu_s[:, None] + inp["b_mu"][None])
            active = inp["b_mask"][None]
            f_o, fn_o, t_o = _penalty(depth_o, n_o, v_s[:, :, None],
                                      v_other, active, mu_o, p, 0.3, (0, 1))
        F_sph = F_sph + jnp.sum(f_o, axis=2)
        imp_o = _imp_coef(t_o, 0.3, p)
        for a in range(3):
            for b in range(a, 3):
                nn = jnp.sum(imp_o * n_o[a] * n_o[b], axis=1)
                N[a][b] = N[a][b] + nn
                if b != a:
                    N[b][a] = N[b][a] + nn
        for g in range(G):
            best = best.consider(depth_o[:, g], jnp.int32(2 + g),
                                 n_o[:, :, g], fn_o[:, g], mu_o[:, g],
                                 t_o[:, g], v_other[:, :, g])
        # reaction wrench per box about the box center
        F_box = -jnp.sum(f_o, axis=1)                     # [3, G, R, C]
        T_box = -jnp.sum(_cross(rel_o, f_o), axis=1)
        N_box = [[jnp.sum(imp_o * n_o[a] * n_o[b], axis=0) for b in range(3)]
                 for a in range(3)]                       # [a][b]: [G, R, C]
        tau_o = jnp.stack([
            jnp.sum(sum(Jv_box[c][:, d] * F_box[c]
                        + Jw_box[c][:, d] * T_box[c] for c in range(3)),
                    axis=0)
            for d in range(Do)])                          # [Do, R, C]

    # ---- stick-slip tangential anchors (contact.anchor_friction) ----
    anc_p = jnp.moveaxis(inp["anc_p"], 1, 0)              # [3, S, R, C]
    anc_b = inp["anc_b"]                                  # i32 [S, R, C]

    def to_world(local, pid):
        out = local
        if meta.has_body:
            cw = _qrot(inp["bquat"][:, None], local) + inp["bpos"][:, None]
            out = jnp.where((pid == 1)[None], cw, out)
        if meta.has_obj:
            acc = jnp.zeros_like(local)
            for g in range(meta.G):
                m = (pid == 2 + g).astype(f32)[None]
                acc = acc + m * (_qrot(bqw[:, g][:, None], local)
                                 + bpw[:, g][:, None])
            out = jnp.where((pid >= 2)[None], acc, out)
        return out

    def to_local(world, pid):
        out = world
        if meta.has_body:
            cl = _qrot_inv(inp["bquat"][:, None],
                           world - inp["bpos"][:, None])
            out = jnp.where((pid == 1)[None], cl, out)
        if meta.has_obj:
            acc = jnp.zeros_like(world)
            for g in range(meta.G):
                m = (pid == 2 + g).astype(f32)[None]
                acc = acc + m * _qrot_inv(bqw[:, g][:, None],
                                          world - bpw[:, g][:, None])
            out = jnp.where((pid >= 2)[None], acc, out)
        return out

    KS = contact_lib.ANCHOR_KS
    cdt = float(2.0 * contact_lib.ANCHOR_ZETA * np.sqrt(KS * 0.1))
    touch_a = best.touch * sticky
    same = (anc_b == best.pid) & (best.pid >= 0) & (touch_a > 0)
    anchor_world = to_world(anc_p, anc_b)
    delta = centers - anchor_world
    n_b = best.normal
    delta_t = delta - _dot(delta, n_b)[None] * n_b
    v_rel = v_s - best.pvel
    vt = v_rel - _dot(v_rel, n_b)[None] * n_b
    ft_raw = -KS * delta_t - cdt * vt
    ft_raw = jnp.where(same[None], ft_raw,
                       -cdt * vt * (touch_a > 0)[None])
    ft_mag = _norm(ft_raw)
    limit = best.mu * best.fn
    stick = (ft_mag <= limit) & same
    scale = jnp.where(ft_mag > 1e-9,
                      jnp.minimum(limit / jnp.maximum(ft_mag, 1e-9), 1.0),
                      0.0)
    ft = ft_raw * scale[None] * (touch_a > 0)[None]
    slid_world = centers + ft / KS
    new_world = jnp.where(stick[None], anchor_world, slid_world)
    new_local = to_local(new_world, best.pid)
    anc_p_new = jnp.where((touch_a > 0)[None], new_local, anc_p)
    anc_b_new = jnp.where(touch_a > 0, best.pid, jnp.int32(-1))

    ft = ft * sticky[None]
    F_sph = F_sph + ft
    coef_t = (h * cdt + h * h * KS) * best.touch
    for a in range(3):
        for b in range(a, 3):
            pt = coef_t * (float(a == b) - n_b[a] * n_b[b])
            N[a][b] = N[a][b] + pt
            if b != a:
                N[b][a] = N[b][a] + pt

    # friction reactions back to the partners
    if meta.has_body:
        is_cube = (best.pid == 1).astype(f32)[None]
        ftc = ft * is_cube
        # velocity-matching cap on the cube-side reaction
        # (≙ engine.py: watermelon-seed squeeze guard; sphere side keeps
        # full stiction)
        vrel_a = v_s - best.pvel
        vt_c = vrel_a - _dot(vrel_a, n_b)[None] * n_b
        m_cube = float(np.asarray(meta.fb.mass).reshape(-1)[0])
        n_touch = jnp.maximum(1.0, jnp.sum(
            is_cube[0] * best.touch, axis=0, keepdims=True))
        cap = (m_cube / n_touch)[None] * (
            _norm(vt_c) + contact_lib.FREE_BODY_HOLD_VEL)[None] / h
        mag = _norm(ftc)[None]
        ftc = ftc * jnp.minimum(mag, cap) / jnp.maximum(mag, 1e-9)
        cube_f = cube_f - jnp.sum(ftc, axis=1)
        cube_t = cube_t - jnp.sum(
            _cross(centers - inp["bpos"][:, None], ftc), axis=1)
    if meta.has_obj:
        for g in range(meta.G):
            oh = (best.pid == 2 + g).astype(f32)[None]
            fg = ft * oh                                   # [3, S, R, C]
            Ff = -jnp.sum(fg, axis=1)                      # [3, R, C]
            Tf = -jnp.sum(_cross(centers - bpw[:, g][:, None], fg), axis=1)
            tau_o = tau_o + jnp.stack([
                sum(Jv_box[c][g, d] * Ff[c] + Jw_box[c][g, d] * Tf[c]
                    for c in range(3))
                for d in range(meta.Do)])

    # ---- robot joint-space solve ----
    tau_r = jnp.stack([
        jnp.sum(sum(Jp[c][:, d] * F_sph[c] for c in range(3)), axis=0)
        for d in range(rt.D)])                             # [Dr, R, C]
    T = [sum(N[a][b][:, None] * Jp[a] for a in range(3)) for b in range(3)]
    rows = [[None] * rt.D for _ in range(rt.D)]
    for d in range(rt.D):
        for f in range(d + 1):
            v = jnp.sum(sum(T[b][:, d] * Jp[b][:, f] for b in range(3)),
                        axis=0)
            rows[d][f] = v
            rows[f][d] = v
    JtNJ_r = jnp.stack([jnp.stack(r) for r in rows])
    rq_new, rv_new = tree_step(rt, M_r, JtNJ_r, rq, rv, inp["tgt"],
                               tau_r, h)

    out = {"rq": rq_new, "rv": rv_new,
           "anc_p": jnp.moveaxis(anc_p_new, 0, 1), "anc_b": anc_b_new}

    # ---- object joint-space solve ----
    if meta.has_obj:
        jv_o, jw_o, _ = tree_link_jacobians(ot, olink_p, olink_q, oaxis_w,
                                            oanchor_w)
        M_o = tree_mass_matrix(ot, olink_q, jv_o, jw_o)
        To = [sum(N_box[a][b][:, None] * Jv_box[a] for a in range(3))
              for b in range(3)]
        orows = [[None] * meta.Do for _ in range(meta.Do)]
        for d in range(meta.Do):
            for f in range(d + 1):
                v = jnp.sum(sum(To[b][:, d] * Jv_box[b][:, f]
                                for b in range(3)), axis=0)
                orows[d][f] = v
                orows[f][d] = v
        JtNJ_o = jnp.stack([jnp.stack(r) for r in orows])
        oq_new, ov_new = tree_step(_obj_args(inp), M_o, JtNJ_o, inp["oq"],
                                   inp["ov"], inp["oq"], tau_o, h)
        out.update({"oq": oq_new, "ov": ov_new})

    # ---- free-body (cube) integration ----
    if meta.has_body:
        fb = meta.fb
        m_cube = float(np.asarray(fb.mass).reshape(-1)[0])
        mu_cube = float(np.asarray(fb.friction).reshape(-1)[0])
        gscale = float(np.asarray(fb.gravity_scale).reshape(-1)[0])
        half_np = np.asarray(fb.half_extents, np.float64).reshape(3)
        signs = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                          for sz in (-1, 1)], np.float64)
        corners_l = _const_arr((signs * half_np[None]).T, R, C)  # [3,8,R,C]
        bp_, bq_ = inp["bpos"], inp["bquat"]
        corners_w = bp_[:, None] + _qrot(bq_[:, None], corners_l)
        rc = corners_w - bp_[:, None]
        v_c = inp["blin"][:, None] + _cross(inp["bang"][:, None], rc)
        n_c = jnp.concatenate([jnp.zeros((2, 8, R, C), f32),
                               jnp.ones((1, 8, R, C), f32)])
        f_c, _, _ = _penalty(corners_w[2], n_c, v_c, 0.0, 1.0,
                             0.5 * (mu_cube + 0.1), p, m_cube / 4.0, (0,),
                             recede_damp=1.0)
        force = cube_f + jnp.sum(f_c, axis=1)
        torque = cube_t + jnp.sum(_cross(rc, f_c), axis=1)
        # net per-body contact Δv cap (≙ engine.py / IsaacGym PhysX
        # max_depenetration_velocity): bounds squeeze-ring ejection kicks
        dv = _norm(force) * h / m_cube
        dv_scale = jnp.minimum(
            1.0, float(p.max_depenetration_velocity)
            / jnp.maximum(dv, 1e-9))[None]
        force = force * dv_scale
        # torque scaled by the same factor (≙ engine.py) — an uncapped
        # angular kick re-converts to linear motion at the next contact
        torque = torque * dv_scale

        Rm = _qmat(bq_)
        I_np = np.asarray(fb.inertia, np.float32).reshape(3, 3)
        Iw = [[sum(Rm[a][k] * float(I_np[k, m]) * Rm[b][m]
                   for k in range(3) for m in range(3)
                   if float(I_np[k, m]) != 0.0)
               for b in range(3)] for a in range(3)]
        Iw_inv = _inv3_tiled(Iw)
        w = inp["bang"]
        Iww = jnp.stack([sum(Iw[a][b] * w[b] for b in range(3))
                         for a in range(3)])
        gyro = _cross(w, Iww)
        rhs = torque - gyro
        angacc = jnp.stack([sum(Iw_inv[a][b] * rhs[b] for b in range(3))
                            for a in range(3)])
        linacc = force / m_cube
        linacc = jnp.stack([linacc[0], linacc[1],
                            linacc[2] + float(p.gravity) * gscale])
        linvel = jnp.clip(inp["blin"] + h * linacc, -20.0, 20.0)
        angvel = jnp.clip(w + h * angacc, -50.0, 50.0)
        pos = bp_ + h * linvel
        dq = jnp.concatenate([0.5 * h * angvel,
                              jnp.zeros((1, R, C), f32)])
        quat = bq_ + _qmul(dq, bq_)
        quat = quat / jnp.sqrt(quat[0] ** 2 + quat[1] ** 2 + quat[2] ** 2
                               + quat[3] ** 2)[None]
        out.update({"bpos": pos, "bquat": quat, "blin": linvel,
                    "bang": angvel})
    return out


# ======================================================================
# packing: [E, ...] arrays ↔ [Eb, ..., R, C] tiles (env axis → lanes)
# ======================================================================

def _tile_shape(E: int):
    """Pick (R, C) lanes per block. None if E doesn't tile."""
    if E % LANE != 0:
        return None
    R = min(8, E // LANE)
    return R, LANE


def pack_tiled(x, R: int):
    """[E, ...f] → [Eb, ...f, R, C] with env e = (i·R + r)·C + c."""
    x = jnp.asarray(x)
    E = x.shape[0]
    y = x.reshape((E // (R * LANE), R, LANE) + x.shape[1:])
    return jnp.moveaxis(y, (1, 2), (-2, -1))


def unpack_tiled(y):
    """[Eb, ...f, R, C] → [E, ...f]."""
    z = jnp.moveaxis(y, (-2, -1), (1, 2))
    return z.reshape((-1,) + z.shape[3:])


# ======================================================================
# scene preparation + kernel invocation
# ======================================================================

def _np1(a):
    """Strip the leading env-1 axis of a static spec array → numpy."""
    a = np.asarray(a)
    assert a.shape[0] == 1, "static spec must have env axis 1"
    return a[0]


def _robot_args(spec) -> TreeArgs:
    return TreeArgs(
        static=True, parent=_np1(spec.parent), joint_type=_np1(spec.joint_type),
        origin_pos=_np1(spec.origin_pos), origin_quat=_np1(spec.origin_quat),
        axis=_np1(spec.axis), dof_idx=_np1(spec.dof_idx),
        link_mask=_np1(spec.link_mask), mass=_np1(spec.mass),
        com=_np1(spec.com), inertia=_np1(spec.inertia),
        dof_child=_np1(spec.dof_child), dof_mask=_np1(spec.dof_mask),
        lower=_np1(spec.dof_lower), upper=_np1(spec.dof_upper),
        vel_limit=_np1(spec.dof_vel_limit), effort=_np1(spec.dof_effort),
        armature=_np1(spec.dof_armature), damping=_np1(spec.dof_damping),
        friction=_np1(spec.dof_friction), kp=_np1(spec.drive_kp),
        kd=_np1(spec.drive_kd), ancestor=_np1(spec.ancestor))


# Interpret-mode Pallas on this 1-vCPU host compiles the fused kernel for
# tens of minutes; the CPU backend therefore always uses the reference jnp
# engine unless a test opts in explicitly.
ALLOW_INTERPRET = False


def fused_supported(scene, E: int) -> bool:
    """Can this scene/state run on the fused kernel?  (Fallbacks documented
    in the module docstring.)"""
    p = scene.params
    if p.coriolis or E < 1:
        return False
    # E not divisible by 128 is handled by padding the env axis up to the
    # next tile multiple inside fused_physics_step (padded rows replicate
    # env 0; no cross-env coupling exists, so real envs are unaffected)
    if jax.default_backend() != "tpu" and not ALLOW_INTERPRET:
        return False
    if (getattr(scene, "obj_grids", None) is not None
            and getattr(scene, "grid_stack", None) is None):
        return False  # grid geoms without their SDF stack — cannot query
    try:
        if np.asarray(scene.robot.parent).shape[0] != 1:
            return False
        if float(np.abs(np.asarray(scene.robot.gravity_scale)).max()) != 0.0:
            return False
        if scene.obj_tree is not None:
            if float(np.abs(np.asarray(
                    scene.obj_tree.gravity_scale)).max()) != 0.0:
                return False
        if scene.free_body is not None:
            for f in scene.free_body:
                if np.asarray(f).shape[0] != 1:
                    return False
    except Exception:
        return False
    return True


def _prepare(scene, E: int, R: int = None):
    """Build (meta, tiled per-env spec dict) for a scene — cached.

    ``R`` overrides the sublane count of the (R, 128) env tiling: the
    sharded path (parallel/mesh.py shard_physics_step) tiles the GLOBAL
    env axis with the PER-DEVICE tile shape so contiguous device blocks
    of the tiled axis line up with contiguous env shards."""
    if R is None:
        R, C = _tile_shape(E)
    else:
        C = LANE
    rt = _robot_args(scene.robot)
    sph = jax.tree.map(np.asarray, scene.spheres)
    S = sph.link_idx.shape[0]
    anc = np.asarray(rt.ancestor, np.float32)
    sphere_anc = anc[np.asarray(sph.link_idx)]          # [S, Dr]

    has_obj = scene.obj_tree is not None
    has_body = scene.free_body is not None
    spec_tiled = {}
    Lo = Do = G = K = 0
    if has_obj:
        ot, bx = scene.obj_tree, scene.obj_boxes
        Lo = ot.parent.shape[-1]
        Do = ot.dof_mask.shape[-1]
        G = bx.link_idx.shape[-1]

        # baked-SDF mesh geoms ride the same G axis as the boxes (poses,
        # Jacobians, reactions, anchors); only their narrowphase comes from
        # outside the kernel.  b_half is a placeholder (never used for the
        # grid slots — the box SDF is only evaluated on the first G geoms).
        gg = getattr(scene, "obj_grids", None)
        if gg is not None:
            gg = jax.tree.map(np.asarray, gg)
            K = gg.link_idx.shape[-1]

        def _cat_geom(a, b):
            a, b = np.asarray(a), np.asarray(b)
            Eg = max(a.shape[0], b.shape[0])
            a = np.broadcast_to(a, (Eg,) + a.shape[1:])
            b = np.broadcast_to(b, (Eg,) + b.shape[1:])
            return np.concatenate([a, b], axis=1)

        def bco(a, feat_shape):
            """Broadcast an [E?|1, ...] spec array to [E, ...] then tile.
            Pure numpy: _prepare may run inside a jit trace and its result
            is cached across traces — staging jnp ops here would leak
            tracers."""
            a = np.asarray(a)
            if a.shape[0] not in (1, E):
                # env axis padded to a tile multiple: replicate env 0 for
                # the pad rows (matches the state padding)
                a = np.concatenate(
                    [a, np.repeat(a[:1], E - a.shape[0], axis=0)], axis=0)
            a = np.broadcast_to(a, (E,) + feat_shape)
            y = a.reshape((E // (R * LANE), R, LANE) + a.shape[1:])
            return np.ascontiguousarray(np.moveaxis(y, (1, 2), (-2, -1)))

        if K:
            b_link = _cat_geom(bx.link_idx, gg.link_idx)
            b_pos = _cat_geom(bx.offset_pos, gg.offset_pos)
            b_quat = _cat_geom(bx.offset_quat, gg.offset_quat)
            b_half = _cat_geom(
                bx.half_extents,
                np.full(gg.offset_pos.shape, 0.01, np.float32))
            b_mask = _cat_geom(bx.geom_mask, gg.geom_mask)
            b_mu = _cat_geom(bx.friction, gg.friction)
            G = G + K
        else:
            b_link, b_pos, b_quat = bx.link_idx, bx.offset_pos, bx.offset_quat
            b_half, b_mask, b_mu = bx.half_extents, bx.geom_mask, bx.friction

        spec_tiled = {
            "o_parent": bco(ot.parent, (Lo,)),
            "o_joint_type": bco(ot.joint_type, (Lo,)),
            "o_origin_pos": bco(ot.origin_pos, (Lo, 3)),
            "o_origin_quat": bco(ot.origin_quat, (Lo, 4)),
            "o_axis": bco(ot.axis, (Lo, 3)),
            "o_dof_idx": bco(ot.dof_idx, (Lo,)),
            "o_link_mask": bco(ot.link_mask, (Lo,)),
            "o_mass": bco(ot.mass, (Lo,)),
            "o_com": bco(ot.com, (Lo, 3)),
            "o_inertia": bco(ot.inertia, (Lo, 3, 3)),
            "o_dof_child": bco(ot.dof_child, (Do,)),
            "o_dof_mask": bco(ot.dof_mask, (Do,)),
            "o_lower": bco(ot.dof_lower, (Do,)),
            "o_upper": bco(ot.dof_upper, (Do,)),
            "o_vel_limit": bco(ot.dof_vel_limit, (Do,)),
            "o_effort": bco(ot.dof_effort, (Do,)),
            "o_armature": bco(ot.dof_armature, (Do,)),
            "o_damping": bco(ot.dof_damping, (Do,)),
            "o_friction": bco(ot.dof_friction, (Do,)),
            "o_kp": bco(ot.drive_kp, (Do,)),
            "o_kd": bco(ot.drive_kd, (Do,)),
            "o_ancestor": bco(ot.ancestor, (Lo, Do)),
            "b_link": bco(b_link, (G,)),
            "b_pos": bco(b_pos, (G, 3)),
            "b_quat": bco(b_quat, (G, 4)),
            "b_half": bco(b_half, (G, 3)),
            "b_mask": bco(b_mask, (G,)),
            "b_mu": bco(b_mu, (G,)),
        }

    fb = None
    if has_body:
        fb = jax.tree.map(np.asarray, scene.free_body)

    meta = FusedMeta(params=scene.params, robot=rt, spheres=sph,
                     sphere_anc=sphere_anc.astype(np.float32), fb=fb,
                     has_obj=has_obj, has_body=has_body, Lo=Lo, Do=Do, G=G,
                     n_grid=K)
    return meta, spec_tiled, (R, C)


_SCENE_CACHE: dict = {}


def _get_prepared(scene, E: int, R: int = None):
    key = (id(scene), E, R)
    hit = _SCENE_CACHE.get(key)
    if hit is not None and hit[0] is scene:
        return hit[1]
    prepared = _prepare(scene, E, R)
    _SCENE_CACHE[key] = (scene, prepared)
    return prepared


def shard_tile(E: int, n_devices: int):
    """Per-device sublane count R for sharding E envs over n devices with
    whole (R, 128) tiles per device, or None if the split doesn't tile."""
    if E % n_devices:
        return None
    El = E // n_devices
    rc = _tile_shape(El)
    if rc is None or El % (rc[0] * LANE):
        return None
    return rc[0]


def _state_names(meta: FusedMeta):
    names = ["rq", "rv", "rrp", "rrq", "anc_p", "anc_b", "tgt"]
    if meta.has_obj:
        names += list(OBJ_STATE_KEYS)
    if meta.n_grid:
        names += ["g_depth", "g_normal", "g_active"]
    if meta.has_body:
        names += list(BODY_STATE_KEYS)
    return names


def _out_names(meta: FusedMeta):
    names = ["rq", "rv", "anc_p", "anc_b"]
    if meta.has_obj:
        names += ["oq", "ov"]
    if meta.has_body:
        names += list(BODY_STATE_KEYS)
    return names


def _make_step_call(meta: FusedMeta, in_names, out_names, interpret):
    def kernel(*refs):
        ins = {n: r[0] for n, r in zip(in_names, refs)}
        outs = _inner_step_tiled(meta, ins)
        for n, r in zip(out_names, refs[len(in_names):]):
            r[0] = outs[n].astype(r.dtype)

    def call(inputs):
        """inputs: dict name → [Eb, ..., R, C]; returns dict of outputs."""
        ops = [inputs[n] for n in in_names]
        Eb = ops[0].shape[0]

        def spec_of(a):
            nd = a.ndim
            return pl.BlockSpec(
                (1,) + a.shape[1:],
                lambda i, _nd=nd: (i,) + (0,) * (_nd - 1),
                memory_space=pltpu.ANY if False else pltpu.VMEM)

        out_shapes = [jax.ShapeDtypeStruct(inputs[n].shape, inputs[n].dtype)
                      for n in out_names]
        out_specs = [spec_of(inputs[n]) for n in out_names]
        res = pl.pallas_call(
            kernel,
            grid=(Eb,),
            in_specs=[spec_of(a) for a in ops],
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            # the S×G candidate intermediates overflow the default 16M
            # scoped-vmem budget; v5e has 128M physical VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*ops)
        return dict(zip(out_names, res))

    return call


def _grid_narrowphase(scene, rq, rrp, rrq, oq, orp, orq):
    """Sphere-vs-baked-SDF narrowphase for the fused kernel's grid slots:
    (depth [E, S, K], world normal [E, 3, S, K], active [E, S, K]).

    Runs as plain XLA *between* the per-inner-step pallas_calls — the
    trilinear gather (per-lane dynamic indices) is the one operation Mosaic
    cannot express, and it is exactly the engine's formulas
    (engine._inner_step 3b) on the same state the kernel reads, so parity
    with the jnp engine is preserved per inner step."""
    from ..ops import rotations as rot
    from ..ops import sdf as sdf_ops
    from . import contact as contact_mod
    from . import kinematics
    from .types import TreeState

    E = rq.shape[0]
    zeros_r = jnp.zeros_like(rq)
    fk_r = kinematics.forward_kinematics(
        scene.robot, TreeState(qpos=rq, qvel=zeros_r, root_pos=rrp,
                               root_quat=rrq))
    centers = contact_mod.sphere_positions(scene.robot, fk_r, scene.spheres,
                                           E)                   # [E, S, 3]
    S = centers.shape[1]
    fk_o = kinematics.forward_kinematics(
        scene.obj_tree, TreeState(qpos=oq, qvel=jnp.zeros_like(oq),
                                  root_pos=orp, root_quat=orq))
    gg = scene.obj_grids
    K = gg.link_idx.shape[-1]
    glink = jnp.broadcast_to(gg.link_idx, (E, K))
    gp, gq = rot.transform_compose(
        kinematics._take_env(fk_o.link_pos, glink),
        kinematics._take_env(fk_o.link_quat, glink),
        jnp.broadcast_to(gg.offset_pos, (E, K, 3)),
        jnp.broadcast_to(gg.offset_quat, (E, K, 4)))
    relg = centers[:, :, None, :] - gp[:, None, :, :]           # [E,S,K,3]
    gq_b = jnp.broadcast_to(gq[:, None], (E, S, K, 4))
    p_locg = rot.quat_rotate_inverse(gq_b, relg)
    gid = jnp.broadcast_to(
        jnp.broadcast_to(gg.grid_id, (E, K))[:, None, :], (E, S, K))
    val, grad = sdf_ops.grid_query_grad(scene.grid_stack, gid, p_locg,
                                        outside_value=1.0)
    gnorm = jnp.linalg.norm(grad, axis=-1)
    n_loc = grad / jnp.maximum(gnorm, 1e-9)[..., None]
    n_w = rot.quat_rotate(gq_b, n_loc)                          # [E,S,K,3]
    radii = jnp.asarray(scene.spheres.radius)
    depth = val - radii[None, :, None]
    active = (gnorm > 1e-6).astype(rq.dtype)
    return depth, jnp.moveaxis(n_w, -1, 1), active


def fused_physics_step(scene, state, pos_targets, local=None):
    """Drop-in replacement for :func:`engine.physics_step` on the fused
    kernel: ``substeps × inner_substeps`` inner steps with constant PD
    targets, each one pallas_call.

    ``local`` is set only by the sharded path (mesh.shard_physics_step):
    a dict with ``meta`` / ``spec`` (this device's shard of the global
    tiled spec arrays, possibly tracers) / ``RC``; ``scene`` then already
    carries this device's per-env obj spec rows (for the narrowphase) and
    the env axis must tile exactly (no padding)."""
    from . import engine as engine_lib  # avoid import cycle

    E = state.robot.qpos.shape[0]
    E_pad = -(-E // LANE) * LANE
    if E_pad > 8 * LANE and E_pad % (8 * LANE):
        # above 8 sublanes the tiling is (8, 128) blocks — pad to whole ones
        E_pad = -(-E_pad // (8 * LANE)) * (8 * LANE)
    if local is not None:
        E_pad = E
    scene_nphase = scene  # scene view for the XLA-side grid narrowphase
    if E_pad != E:
        # pad the env axis to a tile multiple with copies of env 0 (envs
        # are fully independent); results are sliced back below
        pad = lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (E_pad - E,) + x.shape[1:])], 0)
        state = jax.tree.map(pad, state)
        pos_targets = pad(pos_targets)
        if getattr(scene, "obj_grids", None) is not None:
            # per-env spec arrays must match the padded env axis for the
            # narrowphase FK (the kernel's own specs are padded in bco)
            def pad_spec(x):
                if (hasattr(x, "ndim") and x.ndim >= 1
                        and x.shape[0] == E and E > 1):
                    return pad(jnp.asarray(x))
                return x
            scene_nphase = scene._replace(
                obj_tree=jax.tree.map(pad_spec, scene.obj_tree),
                obj_grids=jax.tree.map(pad_spec, scene.obj_grids))
    if local is not None:
        meta, spec_tiled = local["meta"], local["spec"]
        R, C = local["RC"]
    else:
        meta, spec_tiled, (R, C) = _get_prepared(scene, E_pad)
    p = scene.params
    n = p.substeps * p.inner_substeps
    interpret = jax.default_backend() == "cpu"

    if state.anchors is None:
        S = meta.spheres.link_idx.shape[0]
        state = state._replace(anchors=contact_lib.init_anchors(E_pad, S))

    f32 = jnp.float32
    carry = {
        "rq": pack_tiled(state.robot.qpos.astype(f32), R),
        "rv": pack_tiled(state.robot.qvel.astype(f32), R),
        "anc_p": pack_tiled(state.anchors.point.astype(f32), R),
        "anc_b": pack_tiled(state.anchors.body.astype(jnp.int32), R),
    }
    const = {
        "rrp": pack_tiled(state.robot.root_pos.astype(f32), R),
        "rrq": pack_tiled(state.robot.root_quat.astype(f32), R),
        "tgt": pack_tiled(jnp.broadcast_to(
            pos_targets, state.robot.qpos.shape).astype(f32), R),
    }
    if meta.has_obj:
        carry["oq"] = pack_tiled(state.obj.qpos.astype(f32), R)
        carry["ov"] = pack_tiled(state.obj.qvel.astype(f32), R)
        const["orp"] = pack_tiled(state.obj.root_pos.astype(f32), R)
        const["orq"] = pack_tiled(state.obj.root_quat.astype(f32), R)
    if meta.has_body:
        carry["bpos"] = pack_tiled(state.body.pos.astype(f32), R)
        carry["bquat"] = pack_tiled(state.body.quat.astype(f32), R)
        carry["blin"] = pack_tiled(state.body.linvel.astype(f32), R)
        carry["bang"] = pack_tiled(state.body.angvel.astype(f32), R)
    const.update(spec_tiled)

    in_names = _state_names(meta) + sorted(spec_tiled)
    out_names = _out_names(meta)
    call = _make_step_call(meta, in_names, out_names, interpret)

    def body(c, _):
        inputs = dict(c)
        inputs.update(const)
        if meta.has_obj:
            inputs["oq"], inputs["ov"] = c["oq"], c["ov"]
        if meta.n_grid:
            # per-step external narrowphase for the baked-SDF geoms (the
            # only gather; everything else stays inside the kernel)
            d, nrm, act = _grid_narrowphase(
                scene_nphase, unpack_tiled(c["rq"]), state.robot.root_pos,
                state.robot.root_quat, unpack_tiled(c["oq"]),
                state.obj.root_pos, state.obj.root_quat)
            inputs["g_depth"] = pack_tiled(d.astype(f32), R)
            inputs["g_normal"] = pack_tiled(nrm.astype(f32), R)
            inputs["g_active"] = pack_tiled(act.astype(f32), R)
        outs = call(inputs)
        new_c = dict(c)
        new_c.update(outs)
        return new_c, None

    if interpret:
        # Interpret mode (CPU tests): a Python loop keeps the pallas_call
        # eager — each kernel op dispatches individually in seconds.  Under
        # lax.scan the interpreted kernel body is inlined into the scan
        # computation and XLA:CPU compiles the whole ~30k-op graph (~2 h on
        # the 1-vCPU CI host).  Inside an enclosing jit (sharded interpret
        # tests) the loop simply unrolls, same as scan at these lengths.
        for _ in range(n):
            carry, _ = body(carry, None)
    else:
        carry, _ = jax.lax.scan(body, carry, None, length=n)

    robot = state.robot._replace(qpos=unpack_tiled(carry["rq"]),
                                 qvel=unpack_tiled(carry["rv"]))
    anchors = contact_lib.AnchorState(
        point=unpack_tiled(carry["anc_p"]),
        body=unpack_tiled(carry["anc_b"]))
    obj = state.obj
    if meta.has_obj:
        obj = state.obj._replace(qpos=unpack_tiled(carry["oq"]),
                                 qvel=unpack_tiled(carry["ov"]))
    body_st = state.body
    if meta.has_body:
        from .types import FreeBodyState
        body_st = FreeBodyState(pos=unpack_tiled(carry["bpos"]),
                                quat=unpack_tiled(carry["bquat"]),
                                linvel=unpack_tiled(carry["blin"]),
                                angvel=unpack_tiled(carry["bang"]))
    out = engine_lib.SceneState(robot=robot, obj=obj, body=body_st,
                                anchors=anchors)
    if E_pad != E:
        out = jax.tree.map(lambda x: x[:E], out)
    return out
