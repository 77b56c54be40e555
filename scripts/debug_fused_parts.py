"""Compare fused tiled sub-functions vs reference sim modules directly."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if os.environ.get("DBG_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np
import jax.numpy as jnp

from partmanip_tpu.sim import dynamics, engine, fused, kinematics, franka
from partmanip_tpu.sim.types import TreeState

E = 128
R = 1
built = franka.build_franka(mobile=True)
spec = built.spec
Dr = spec.dof_mask.shape[-1]

rng = np.random.RandomState(0)
q0 = np.array([0, 0, 0, -0.2724, -0.1511, 0.2898, -2.3792, -2.8973, 2.4690,
               2.3973, 0.04, 0.04], np.float32)
qpos = np.tile(q0, (E, 1)) + rng.uniform(-0.3, 0.3, (E, Dr)).astype(np.float32)
qvel = rng.uniform(-1, 1, (E, Dr)).astype(np.float32)
root_pos = np.tile(np.array([0.4, 0, 0], np.float32), (E, 1))
root_quat = np.tile(np.array([0, 0, 1, 0], np.float32), (E, 1))
state = TreeState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                  root_pos=jnp.asarray(root_pos),
                  root_quat=jnp.asarray(root_quat))

# reference
fk = kinematics.forward_kinematics(spec, state)
Mref = dynamics.mass_matrix(spec, fk, E)

# fused tiled
ta = fused._robot_args(spec)
rq = fused.pack_tiled(state.qpos, R)[0]
rv = fused.pack_tiled(state.qvel, R)[0]
rrp = fused.pack_tiled(state.root_pos, R)[0]
rrq = fused.pack_tiled(state.root_quat, R)[0]
link_p, link_q, axis_w, anchor_w = fused.tree_fk(ta, rq, rrp, rrq)

def unp(x):  # [..., R, C] -> [E, ...] for leading-feature arrays
    return np.asarray(fused.unpack_tiled(x[None]))

def cmp(name, a, b, tol=1e-4):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b).max()
    print(f"{name:14s} maxdiff {d:.3e}" + ("  <-- FAIL" if d > tol else ""))

L = spec.parent.shape[-1]
lp_t = np.stack([unp(jnp.moveaxis(link_p[l], 0, 0)) for l in range(L)], 1)
# link_p[l]: [3, R, C] -> unpack: moveaxis to [3,R,C]->[E,3]? pack layout:
# [E,3] -> [Eb,3,R,C]; link_p[l] is [3,R,C]; unpack needs [Eb,3,R,C]
lp_t = np.stack([unp(link_p[l]) for l in range(L)], 1)   # [E, L, 3]
lq_t = np.stack([unp(link_q[l]) for l in range(L)], 1)
cmp("link_pos", lp_t, fk.link_pos)
# quats may differ by sign; compare abs dot
qd = np.abs((lq_t * np.asarray(fk.link_quat)).sum(-1))
cmp("link_quat|dot|", qd, np.ones_like(qd))
ax_t = unp(jnp.moveaxis(axis_w, 1, 0))   # axis_w [D,3,R,C] -> [3,D,R,C]?
# unpack expects [Eb, D, 3, R, C]; build: moveaxis to [D,3,R,C]
ax_t = unp(axis_w)                        # [E, D, 3]
an_t = unp(anchor_w)
cmp("dof_axis_w", ax_t, fk.dof_axis_w)
cmp("dof_anchor_w", an_t, fk.dof_anchor_w)

jv_t, jw_t, com_t = fused.tree_link_jacobians(ta, link_p, link_q, axis_w,
                                              anchor_w)
jvr, jwr, comr = kinematics.link_jacobians(spec, fk)
# jv_t [3, L, D, R, C] -> [E, L, 3, D]? reference jv [E, L, 3, D]
jv_un = unp(jnp.moveaxis(jv_t, (0, 1, 2), (1, 0, 2)))  # [L,3,D,R,C]->[E,L,3,D]
jw_un = unp(jnp.moveaxis(jw_t, (0, 1, 2), (1, 0, 2)))
cmp("link_jv", jv_un, jvr)
cmp("link_jw", jw_un, jwr)
cmp("com_w", unp(jnp.moveaxis(com_t, 0, 1)), comr)

M_t = fused.tree_mass_matrix(ta, link_q, jv_t, jw_t)
cmp("mass_matrix", unp(M_t), Mref, 1e-3)

# sphere jacobian
sph = franka.franka_collision_spheres(built)
S = sph.link_idx.shape[0]
centers_ref = np.asarray(
    __import__("partmanip_tpu.sim.contact", fromlist=["c"]).sphere_positions(
        spec, fk, sph, E))
sanc = np.asarray(spec.ancestor)[0][np.asarray(sph.link_idx)]
centers_t = jnp.stack(
    [fused._vadd(link_p[int(sph.link_idx[s])],
                 fused._qrot(link_q[int(sph.link_idx[s])],
                             fused._c3(sph.offset[s])))
     for s in range(S)], axis=1)
cmp("sphere_pos", unp(jnp.moveaxis(centers_t, 0, 1)), centers_ref)
Jp_t = fused.point_jacobian_tiled(ta, axis_w, anchor_w, centers_t, sanc)
li = jnp.broadcast_to(jnp.asarray(sph.link_idx)[None], (E, S))
Jp_ref = kinematics.point_jacobian(spec, fk, li, jnp.asarray(centers_ref))
Jp_un = unp(jnp.moveaxis(Jp_t, (0, 1, 2), (1, 0, 2)))
cmp("point_jac", Jp_un, Jp_ref)

# pure drive step, no contacts
h = 1.0 / 240.0
targets = qpos + rng.uniform(-0.05, 0.05, (E, Dr)).astype(np.float32)
gravity = jnp.array([0.0, 0.0, -9.81])
new_ref = dynamics.step_tree(spec, state, fk, Mref, jnp.asarray(targets),
                             jnp.zeros((E, Dr)), h, gravity, implicit=None,
                             coriolis=False)
tgt_t = fused.pack_tiled(jnp.asarray(targets), R)[0]
JtNJ0 = jnp.zeros_like(M_t)
q_new, v_new = fused.tree_step(ta, M_t, JtNJ0, rq, rv, tgt_t,
                               jnp.zeros_like(rq), h)
cmp("step qpos", unp(q_new), new_ref.qpos, 1e-4)
cmp("step qvel", unp(v_new), new_ref.qvel, 1e-3)
print("done")
