"""Decompose train-iteration time: RTT vs compute; env.step pieces."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from partmanip_tpu import config
from partmanip_tpu.envs.open_drawer import OpenDrawerEnv
from partmanip_tpu.algos.ppo import PPO

E = 4096
class _L:
    save_ckpt_dir = "/tmp/bench_ckpt"
    def info(self, *a, **k): pass

cfg, sp = config.process_cfgs([
    "--taskcfg", "open_drawer", "--algo.num_envs", str(E),
    "--task.asset.num_objects", "16"])
env = OpenDrawerEnv(cfg["task"], sp)
ppo = PPO(env, cfg["algo"], _L())
ts, es = ppo.init_state(seed=0)
ts, es, m = ppo._jit_train_iter(ts, es, ppo.lr); _ = float(list(m.values())[0])
ts, es, m = ppo._jit_train_iter(ts, es, ppo.lr); _ = float(list(m.values())[0])

# (a) per-iteration fetch (the bench/train-loop pattern)
t0 = time.time()
for _ in range(10):
    ts, es, m = ppo._jit_train_iter(ts, es, ppo.lr)
    _ = float(list(m.values())[0])
per_fetch = (time.time() - t0) / 10

# (b) fetch only at the end (RTT hidden by pipelining)
t0 = time.time()
for _ in range(10):
    ts, es, m = ppo._jit_train_iter(ts, es, ppo.lr)
_ = float(list(m.values())[0])
pipelined = (time.time() - t0) / 10
print(f"iter with per-iter fetch: {per_fetch*1e3:.1f} ms")
print(f"iter pipelined (1 fetch/10): {pipelined*1e3:.1f} ms")

# (c) env.step alone (policy excluded)
a = jnp.zeros((E, env.num_actions))
step = jax.jit(lambda s: env.step(s, a, train=True)[0])
s2 = step(es); _ = float(s2.rew_buf[0])
s2 = step(s2); _ = float(s2.rew_buf[0])
t0 = time.time()
for _ in range(20):
    s2 = step(s2)
_ = float(s2.rew_buf[0])
print(f"env.step total: {(time.time()-t0)/20*1e3:.2f} ms")

# (d) physics alone
from partmanip_tpu.sim import fused
tgt = jnp.tile(jnp.asarray(env.default_dof), (E, 1))
phys = jax.jit(lambda s: fused.fused_physics_step(env.scene, s, tgt))
p1 = phys(es.sim); _ = float(p1.robot.qpos[0,0])
t0 = time.time()
for _ in range(20):
    p1 = phys(p1)
_ = float(p1.robot.qpos[0,0])
phys_t = (time.time()-t0)/20
print(f"physics_step: {phys_t*1e3:.2f} ms (x{env.control_freq_inv} per env.step = {phys_t*env.control_freq_inv*1e3:.2f})")
