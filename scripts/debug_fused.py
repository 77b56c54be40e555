"""Debug harness: fused inner step vs reference engine, CPU, tiny E."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
if os.environ.get("DBG_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp

from partmanip_tpu import config
from partmanip_tpu.sim import engine, fused

TASK = sys.argv[1] if len(sys.argv) > 1 else "open_drawer"
E = 128

if TASK == "open_drawer":
    from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
    cfg, sp = config.process_cfgs(
        ["--taskcfg", "open_drawer", "--algo.num_envs", str(E),
         "--task.asset.num_objects", "3",
         "--task.asset.assetRoot", "/tmp/partmanip_assets_fused"])
    env = OpenDrawerEnv(cfg["task"], sp)
else:
    from partmanip_tpu.envs.grasp_cube import GraspCubeEnv
    cfg, sp = config.process_cfgs(
        ["--taskcfg", "grasp_cube", "--algo.num_envs", str(E)])
    env = GraspCubeEnv(cfg["task"], sp)

state = env.init_state(jax.random.PRNGKey(0))
sim = state.sim
rng = np.random.RandomState(0)
targets = jnp.asarray(
    np.asarray(jnp.tile(jnp.asarray(env.default_dof), (E, 1)))
    + rng.uniform(-0.05, 0.05, (E, env.default_dof.shape[0])).astype(np.float32))

assert fused.fused_supported(env.scene, E), "fused path must be supported"

# give the sim a nontrivial state: run a few reference control steps first
ref_scene = env.scene._replace(params=env.scene.params._replace(use_fused=False))
warm = jax.jit(lambda s: engine.physics_step(ref_scene, s, targets))
for _ in range(3):
    sim = warm(sim)

step_ref = jax.jit(lambda s: engine.physics_step(ref_scene, s, targets))
step_fus = jax.jit(lambda s: fused.fused_physics_step(env.scene, s, targets))

s_ref, s_fus = sim, sim
for it in range(3):
    s_ref = step_ref(s_ref)
    s_fus = step_fus(s_fus)

    def cmp(name, a, b, tol):
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b).max()
        print(f"  step{it} {name:10s} maxdiff {d:.3e} (|a|max {np.abs(a).max():.3e})"
              + ("  <-- FAIL" if d > tol else ""))
        return d <= tol

    ok = True
    ok &= cmp("rqpos", s_ref.robot.qpos, s_fus.robot.qpos, 5e-4)
    ok &= cmp("rqvel", s_ref.robot.qvel, s_fus.robot.qvel, 5e-3)
    if s_ref.obj is not None:
        ok &= cmp("oqpos", s_ref.obj.qpos, s_fus.obj.qpos, 5e-4)
        ok &= cmp("oqvel", s_ref.obj.qvel, s_fus.obj.qvel, 5e-3)
    if s_ref.body is not None:
        ok &= cmp("bpos", s_ref.body.pos, s_fus.body.pos, 5e-4)
        ok &= cmp("bquat", s_ref.body.quat, s_fus.body.quat, 5e-4)
        ok &= cmp("blin", s_ref.body.linvel, s_fus.body.linvel, 5e-3)
        ok &= cmp("bang", s_ref.body.angvel, s_fus.body.angvel, 5e-2)
    ok &= cmp("anc_p", s_ref.anchors.point, s_fus.anchors.point, 5e-4)
    ok &= cmp("anc_b", s_ref.anchors.body, s_fus.anchors.body, 0)
print("PASS" if ok else "MISMATCH")
