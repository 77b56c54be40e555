"""Fused vs reference physics step timing on TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from partmanip_tpu import config
from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
from partmanip_tpu.sim import engine, fused

E = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
cfg, sp = config.process_cfgs([
    "--taskcfg", "open_drawer", "--algo.num_envs", str(E),
    "--task.asset.num_objects", "16"])
env = OpenDrawerEnv(cfg["task"], sp)
state = env.init_state(jax.random.PRNGKey(0))
targets = jnp.tile(jnp.asarray(env.default_dof), (E, 1))

assert fused.fused_supported(env.scene, E)
step = jax.jit(lambda s: fused.fused_physics_step(env.scene, s, targets))
t0 = time.time(); s1 = step(state.sim); _ = float(s1.robot.qpos[0, 0])
print(f"fused compile+1: {time.time()-t0:.2f}s")
s = s1
N = 50
t0 = time.time()
for _ in range(N):
    s = step(s)
_ = float(s.robot.qpos[0, 0])
dt = (time.time() - t0) / N
n_inner = sp.substeps * sp.inner_substeps
cfi = env.control_freq_inv
print(f"fused physics_step: {dt*1e3:.2f} ms ({dt/n_inner*1e3:.3f} ms/inner)"
      f" -> {E/(dt*cfi):.0f} env-steps/s sim-only")
import numpy as np
print("finite:", bool(np.isfinite(np.asarray(s.robot.qpos)).all()))
