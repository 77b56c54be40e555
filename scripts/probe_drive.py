"""Per-substep drive transient probe: step a bare Franka toward a fixed
joint-target offset and print qvel/qpos error per substep.  Discriminates
drive chatter (velocity oscillation at the substep rate) from IK-commanded
motion when the task-space diagnostics show sustained high joint speeds.

Run: python scripts/probe_drive.py
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from partmanip_tpu.sim import dynamics, kinematics, franka
from partmanip_tpu.sim.types import TreeState


def tree_state(spec, qpos):
    q = jnp.asarray(qpos, jnp.float32).reshape(1, -1)
    return TreeState(qpos=q, qvel=jnp.zeros_like(q),
                     root_pos=jnp.zeros((1, 3)),
                     root_quat=jnp.array([[0.0, 0, 0, 1]]))


def main():
    built = franka.build_franka(mobile=False)
    spec = built.spec
    q0 = np.array([0.6806, -0.2319, -0.6754, -2.4905, -0.1961, 2.2925,
                   -0.6390, 0.04, 0.04], np.float32)
    st = tree_state(spec, q0)
    h = 1.0 / 240.0
    dq = np.zeros(9, np.float32)
    dq[:7] = 0.01            # 10 mrad on every arm joint
    targets = jnp.asarray((q0 + dq)[None])

    @jax.jit
    def sub(st):
        fk = kinematics.forward_kinematics(spec, st)
        M = dynamics.mass_matrix(spec, fk, 1)
        return dynamics.step_tree(spec, st, fk, M, targets,
                                  jnp.zeros_like(st.qpos), h,
                                  jnp.asarray([0.0, 0.0, -9.81]),
                                  coriolis=False)

    print("substep |qvel| per joint (first 24 substeps, 10 mrad step):")
    for i in range(24):
        st = sub(st)
        qv = np.asarray(st.qvel[0, :7])
        err = np.asarray(st.qpos[0, :7]) - (q0 + dq)[:7]
        print(f"  s={i:2d} qv={np.round(qv, 3).tolist()} "
              f"err_mrad={np.round(1e3 * err, 2).tolist()}")


if __name__ == "__main__":
    main()
