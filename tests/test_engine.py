"""Scene-engine integration tests: the TPU analog of the reference's
controller-calibration and heuristic-grasp debug harnesses
(``tune_pid.py:102-142``, ``load_robot.py:126-137``)."""

import numpy as np
import jax
import jax.numpy as jnp

from partmanip_tpu.envs import control
from partmanip_tpu.sim import engine, franka, kinematics
from partmanip_tpu.sim.types import (FreeBodySpec, FreeBodyState, SimParams,
                                     TreeState)


def make_cube_scene(E=1):
    built = franka.build_franka(mobile=False)
    spheres = franka.franka_collision_spheres(built)
    bi = franka.franka_body_indices(built)
    half = 0.025
    m = 1000.0 * (2 * half) ** 3
    cube = FreeBodySpec(
        mass=np.full(E, m, np.float32),
        inertia=np.tile(np.eye(3, dtype=np.float32) * (m * (2 * half) ** 2 / 6),
                        (E, 1, 1)),
        half_extents=np.full((E, 3), half, np.float32),
        gravity_scale=np.ones(E, np.float32),
        friction=np.ones(E, np.float32),
    )
    scene = engine.SceneSpec(robot=built.spec, spheres=spheres,
                             params=SimParams(), free_body=cube)
    q0 = np.array([0.6806, -0.2319, -0.6754, -2.4905, -0.1961, 2.2925,
                   -0.639, 0.04, 0.04], np.float32)
    rq = np.array([0, 0, 0.707, 0.707], np.float32)
    rq /= np.linalg.norm(rq)
    rstate = TreeState(
        qpos=jnp.tile(jnp.asarray(q0), (E, 1)), qvel=jnp.zeros((E, 9)),
        root_pos=jnp.tile(jnp.array([0.0, -0.5, 0]), (E, 1)),
        root_quat=jnp.tile(jnp.asarray(rq), (E, 1)))
    bstate = FreeBodyState(
        pos=jnp.tile(jnp.array([0.0, 0, half]), (E, 1)),
        quat=jnp.tile(jnp.array([0.0, 0, 0, 1]), (E, 1)),
        linvel=jnp.zeros((E, 3)), angvel=jnp.zeros((E, 3)))
    cfg = control.FrankaControlConfig(
        drive_mode="ik_abs", mobile=False, dt=1 / 60, num_dofs=9,
        lefttip_idx=bi["lefttip"], righttip_idx=bi["righttip"],
        root_quat=tuple(rq))
    return scene, engine.SceneState(robot=rstate, body=bstate), cfg


class TestCubeScene:
    def test_cube_rests_on_ground(self):
        """A cube dropped at rest height stays put for 1 s (robot far away)."""
        scene, state, cfg = make_cube_scene()
        # park the arm up high so nothing touches the cube
        @jax.jit
        def step(state):
            fk = kinematics.forward_kinematics(scene.robot, state.robot)
            view = control.robot_view(cfg, scene.robot, fk, state.robot)
            a = jnp.zeros((1, 8)).at[0, 2].set(0.4).at[0, 3].set(1.0).at[0, 7].set(1.0)
            tgt = control.compute_targets(cfg, scene.robot, view, a)
            return engine.physics_step(scene, state, tgt)

        for _ in range(60):
            state = step(state)
        pos = np.asarray(state.body.pos[0])
        np.testing.assert_allclose(pos[:2], 0.0, atol=2e-3)
        assert abs(pos[2] - 0.025) < 2e-3
        assert float(jnp.linalg.norm(state.body.linvel)) < 0.05

    def test_scripted_grasp_and_lift(self):
        """Servo down, pinch, and lift the cube to 0.24 m — exercises IK
        control, PD drives, and two-way grasp contact dynamics end-to-end."""
        scene, state, cfg = make_cube_scene()

        @jax.jit
        def step(state, action):
            fk = kinematics.forward_kinematics(scene.robot, state.robot)
            view = control.robot_view(cfg, scene.robot, fk, state.robot)
            tgt = control.compute_targets(cfg, scene.robot, view, action)
            return engine.physics_step(scene, state, tgt)

        down_quat = np.array([1.0, 0, 0, 0], np.float32)

        def act(pos, grip):
            a = np.zeros((1, 8), np.float32)
            a[0, :3] = pos
            a[0, 3:7] = down_quat
            a[0, 7] = grip
            return jnp.asarray(a)

        phases = [
            (act([0, 0, 0.25], 1.0), 60),
            (act([0, 0, 0.15], 1.0), 30),
            (act([0, 0, 0.08], 1.0), 30),
            (act([0, 0, 0.034], 1.0), 40),
            (act([0, 0, 0.034], -1.0), 30),   # close
            (act([0, 0, 0.10], -1.0), 40),    # lift gently
            (act([0, 0, 0.15], -1.0), 30),
            (act([0, 0, 0.20], -1.0), 30),
            (act([0, 0, 0.24], -1.0), 30),
        ]
        for a, n in phases:
            for _ in range(n):
                state = step(state, a)

        fk = kinematics.forward_kinematics(scene.robot, state.robot)
        view = control.robot_view(cfg, scene.robot, fk, state.robot)
        cube_z = float(state.body.pos[0, 2])
        assert cube_z > 0.2, f"cube not lifted: z={cube_z}"
        # still pinched: gripper at ~cube width, cube near the tip
        assert 0.04 < float(view.gripper_length[0]) < 0.065
        tip_to_cube = float(jnp.linalg.norm(view.tip_pos[0] - state.body.pos[0]))
        assert tip_to_cube < 0.03
