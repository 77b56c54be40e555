"""Baseline timing of the physics step at 4096 envs on TPU."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from partmanip_tpu import config
from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
from partmanip_tpu.sim import engine

E = 4096
cfg, sp = config.process_cfgs([
    "--taskcfg", "open_drawer", "--algo.num_envs", str(E),
    "--task.asset.num_objects", "16"])
env = OpenDrawerEnv(cfg["task"], sp)
state = env.init_state(jax.random.PRNGKey(0))
targets = jnp.tile(jnp.asarray(env.default_dof), (E, 1))

S = env.spheres.link_idx.shape[0]
G = env.scene.obj_boxes.link_idx.shape[-1]
Lo = env.scene.obj_tree.parent.shape[-1]
Do = env.scene.obj_tree.dof_mask.shape[-1]
print(f"E={E} S={S} G={G} Lo={Lo} Do={Do} "
      f"Lr={env.scene.robot.parent.shape[-1]} Dr={env.scene.robot.dof_mask.shape[-1]} "
      f"substeps={sp.substeps} inner={sp.inner_substeps} cfi={env.control_freq_inv}")

step = jax.jit(lambda s: engine.physics_step(env.scene, s, targets))
t0 = time.time(); s1 = step(state.sim); _ = float(s1.robot.qpos[0, 0])
print(f"compile+1: {time.time()-t0:.2f}s")
t0 = time.time()
N = 20
s = s1
for _ in range(N):
    s = step(s)
_ = float(s.robot.qpos[0, 0])
dt = (time.time() - t0) / N
n_inner = sp.substeps * sp.inner_substeps
print(f"physics_step: {dt*1e3:.2f} ms  ({dt/n_inner*1e3:.2f} ms/inner, "
      f"{n_inner} inner)  -> {E/ (dt*env.control_freq_inv):.0f} env-steps/s sim-only")
