"""One inner step on the warmed drawer state: fused body vs engine."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if os.environ.get("DBG_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np
import jax.numpy as jnp

from partmanip_tpu import config
from partmanip_tpu.sim import engine, fused

E = 128
from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
cfg, sp = config.process_cfgs(
    ["--taskcfg", "open_drawer", "--algo.num_envs", str(E),
     "--task.asset.num_objects", "3",
     "--task.asset.assetRoot", "/tmp/partmanip_assets_fused"])
env = OpenDrawerEnv(cfg["task"], sp)
sim = env.init_state(jax.random.PRNGKey(0)).sim
rng = np.random.RandomState(0)
targets = jnp.asarray(np.tile(env.default_dof, (E, 1))
                      + rng.uniform(-0.05, 0.05, (E, 12)).astype(np.float32))
ref_scene = env.scene._replace(params=sp._replace(use_fused=False))
warm = jax.jit(lambda s: engine.physics_step(ref_scene, s, targets))
for _ in range(3):
    sim = warm(sim)

h = sp.h
gravity = jnp.array([0.0, 0.0, sp.gravity])
s_ref = engine._inner_step(ref_scene, sim, targets, h, gravity,
                           coriolis=False)

meta, spec_tiled, (R, C) = fused._get_prepared(env.scene, E)
inp = {
    "rq": fused.pack_tiled(sim.robot.qpos, R)[0],
    "rv": fused.pack_tiled(sim.robot.qvel, R)[0],
    "rrp": fused.pack_tiled(sim.robot.root_pos, R)[0],
    "rrq": fused.pack_tiled(sim.robot.root_quat, R)[0],
    "anc_p": fused.pack_tiled(sim.anchors.point, R)[0],
    "anc_b": fused.pack_tiled(sim.anchors.body, R)[0],
    "tgt": fused.pack_tiled(targets, R)[0],
    "oq": fused.pack_tiled(sim.obj.qpos, R)[0],
    "ov": fused.pack_tiled(sim.obj.qvel, R)[0],
    "orp": fused.pack_tiled(sim.obj.root_pos, R)[0],
    "orq": fused.pack_tiled(sim.obj.root_quat, R)[0],
}
inp.update({k: v[0] for k, v in spec_tiled.items()})
out = fused._inner_step_tiled(meta, inp)

def unp(x):
    return np.asarray(fused.unpack_tiled(x[None]))

def cmp(name, a, b, tol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b).max()
    am = np.abs(a - b).argmax()
    print(f"{name:10s} maxdiff {d:.3e} at {np.unravel_index(am, a.shape)}"
          + ("  <-- FAIL" if d > tol else ""))

cmp("rqpos", s_ref.robot.qpos, unp(out["rq"]))
cmp("rqvel", s_ref.robot.qvel, unp(out["rv"]), 1e-4)
cmp("oqpos", s_ref.obj.qpos, unp(out["oq"]))
cmp("oqvel", s_ref.obj.qvel, unp(out["ov"]), 1e-4)
cmp("anc_p", s_ref.anchors.point, unp(out["anc_p"]), 1e-5)
cmp("anc_b", s_ref.anchors.body, unp(out["anc_b"]), 0)
print("done")
