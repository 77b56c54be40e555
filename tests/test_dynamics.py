import numpy as np
import jax
import jax.numpy as jnp

from partmanip_tpu.sim import builder, contact, dynamics, engine, franka, kinematics
from partmanip_tpu.sim.types import (JOINT_PRISMATIC, JOINT_REVOLUTE,
                                     FreeBodySpec, FreeBodyState, SimParams,
                                     SphereGeoms, TreeState)

G = 9.81
GRAV = jnp.array([0.0, 0.0, -G])


def tree_state(spec, qpos, qvel=None):
    q = jnp.asarray(qpos, jnp.float32).reshape(1, -1)
    qv = jnp.zeros_like(q) if qvel is None else jnp.asarray(qvel, jnp.float32).reshape(1, -1)
    return TreeState(qpos=q, qvel=qv, root_pos=jnp.zeros((1, 3)),
                     root_quat=jnp.array([[0.0, 0, 0, 1]]))


def simulate(spec, state, steps, h, targets=None, coriolis=True, tau=0.0):
    tgt = state.qpos if targets is None else jnp.asarray(targets).reshape(1, -1)
    tau_ext = jnp.full_like(state.qpos, tau)

    def body(carry, _):
        fk = kinematics.forward_kinematics(spec, carry)
        M = dynamics.mass_matrix(spec, fk, 1)
        new = dynamics.step_tree(spec, carry, fk, M, tgt,
                                 tau_ext, h, GRAV, coriolis=coriolis)
        return new, carry.qpos

    final, traj = jax.jit(
        lambda st: jax.lax.scan(body, st, None, length=steps)
    )(state)
    return final, np.asarray(traj)


def pendulum_spec(l=0.5, m=1.0):
    t = builder.build_tree([
        builder.LinkDef("base"),
        builder.LinkDef("rod", parent="base", joint_type=JOINT_REVOLUTE,
                        axis=(0, 1, 0), lower=-10, upper=10,
                        mass=m, com=(0, 0, -l), inertia=(1e-4,) * 3),
    ])
    return t.spec


class TestPendulum:
    def test_period(self):
        """Small-amplitude period matches √(I/mgl)."""
        l, m = 0.5, 1.0
        spec = pendulum_spec(l, m)
        h = 1.0 / 960
        st = tree_state(spec, [0.05])
        _, traj = simulate(spec, st, 2000, h)
        qs = traj[:, 0, 0]
        cross = np.where((qs[:-1] > 0) & (qs[1:] <= 0))[0][0]
        quarter = (cross + 1) * h
        I_tot = 1e-4 + m * l * l
        period = 2 * np.pi * np.sqrt(I_tot / (m * G * l))
        assert abs(4 * quarter - period) / period < 0.02

    def test_energy_conservation(self):
        l, m = 0.5, 1.0
        spec = pendulum_spec(l, m)
        h = 1.0 / 960

        def energy(st):
            fk = kinematics.forward_kinematics(spec, st)
            M = dynamics.mass_matrix(spec, fk, 1)
            ke = 0.5 * float(st.qvel[0] @ M[0] @ st.qvel[0])
            q = float(st.qpos[0, 0])
            pe = m * G * l * (1 - np.cos(q))
            return ke + pe

        st = tree_state(spec, [1.2])
        e0 = energy(st)
        st, _ = simulate(spec, st, 960, h)  # 1 s
        e1 = energy(st)
        assert abs(e1 - e0) / e0 < 0.02

    def test_equilibrium(self):
        spec = pendulum_spec()
        st = tree_state(spec, [0.0])
        st, _ = simulate(spec, st, 200, 1 / 960)
        assert abs(float(st.qpos[0, 0])) < 1e-6


class TestDoublePendulumEnergy:
    def test_energy_conservation_with_coriolis(self):
        """Chaotic double pendulum conserves energy — exercises M(q) and the
        JVP-based velocity-product terms together."""
        l, m = 0.4, 1.0
        t = builder.build_tree([
            builder.LinkDef("base"),
            builder.LinkDef("rod1", parent="base", joint_type=JOINT_REVOLUTE,
                            axis=(0, 1, 0), lower=-20, upper=20, mass=m,
                            com=(0, 0, -l), inertia=(1e-4,) * 3),
            builder.LinkDef("rod2", parent="rod1", joint_type=JOINT_REVOLUTE,
                            origin_pos=(0, 0, -l), axis=(0, 1, 0),
                            lower=-20, upper=20, mass=m,
                            com=(0, 0, -l), inertia=(1e-4,) * 3),
        ])
        spec = t.spec
        h = 1.0 / 1920

        def energy(st):
            fk = kinematics.forward_kinematics(spec, st)
            M = dynamics.mass_matrix(spec, fk, 1)
            ke = 0.5 * float(st.qvel[0] @ M[0] @ st.qvel[0])
            _, _, com_w = kinematics.link_jacobians(spec, fk)
            pe = float(m * G * (com_w[0, 1, 2] + com_w[0, 2, 2]))
            return ke + pe

        st = tree_state(spec, [1.5, 0.5])
        e0 = energy(st)
        st, _ = simulate(spec, st, 1920, h)
        e1 = energy(st)
        scale = 2 * m * G * 2 * l  # energy scale of the system
        assert abs(e1 - e0) / scale < 0.02


class TestPDDrive:
    def test_prismatic_tracking(self):
        """Implicit PD with huge gains is stable and tracks in few steps."""
        t = builder.build_tree([
            builder.LinkDef("base"),
            builder.LinkDef("slider", parent="base", joint_type=JOINT_PRISMATIC,
                            axis=(1, 0, 0), lower=-1, upper=1, effort=1e6,
                            mass=1.0, inertia=(0.01,) * 3),
        ])
        spec = t.spec._replace(drive_kp=np.array([[1e6]], np.float32),
                               drive_kd=np.array([[1e3]], np.float32),
                               gravity_scale=np.zeros(1, np.float32))
        st = tree_state(spec, [0.0])
        st, _ = simulate(spec, st, 8, 1.0 / 240, targets=[0.05])
        assert abs(float(st.qpos[0, 0]) - 0.05) < 1e-3
        # and no instability
        assert abs(float(st.qvel[0, 0])) < 1.0

    def test_effort_clamp(self):
        """With a small effort limit the drive cannot exceed it: acceleration
        bounded by effort/mass."""
        t = builder.build_tree([
            builder.LinkDef("base"),
            builder.LinkDef("slider", parent="base", joint_type=JOINT_PRISMATIC,
                            axis=(1, 0, 0), lower=-5, upper=5, effort=2.0,
                            vel_limit=100.0, mass=1.0, inertia=(0.01,) * 3),
        ])
        spec = t.spec._replace(drive_kp=np.array([[1e6]], np.float32),
                               drive_kd=np.array([[1e3]], np.float32),
                               gravity_scale=np.zeros(1, np.float32))
        h = 1.0 / 960
        st = tree_state(spec, [0.0])
        st1, _ = simulate(spec, st, 96, h, targets=[3.0])  # 0.1 s
        # semi-implicit Euler under constant F: x = ½(F/m)t² + ½(F/m)ht.
        # The implicit saturated servo realizes F·m/(m + h·b) per substep
        # (~0.1 % conservative undershoot), hence the slightly loose bound.
        expect = 0.5 * 2.0 * 0.1 ** 2 + 0.5 * 2.0 * h * 0.1
        assert abs(float(st1.qpos[0, 0]) - expect) < 5e-5

    def test_franka_pd_stability_and_tracking(self):
        """tune_pid-style check (≙ tune_pid.py:102-142): command small joint
        offsets, verify the arm tracks within a control step and nothing
        blows up under the 1e6/1e3 gains."""
        built = franka.build_franka(mobile=False)
        spec = built.spec
        q0 = np.array([0.6806, -0.2319, -0.6754, -2.4905, -0.1961, 2.2925,
                       -0.6390, 0.04, 0.04], np.float32)
        st = tree_state(spec, q0)
        dq = np.zeros(9, np.float32)
        dq[:7] = 0.003
        # After one control period (16 inner steps) the arm is mid-transient:
        # effort-limited drives ring physically (bounded limit cycle).
        st1, _ = simulate(spec, st, 16, 1.0 / 960, targets=q0 + dq)
        err1 = np.abs(np.asarray(st1.qpos[0]) - (q0 + dq))
        assert err1[:7].max() < 4e-3, err1
        assert np.abs(np.asarray(st1.qvel[0])).max() < 2.5
        # After ~4 control periods the limit cycle has decayed.
        st4, _ = simulate(spec, st, 64, 1.0 / 960, targets=q0 + dq)
        err4 = np.abs(np.asarray(st4.qpos[0]) - (q0 + dq))
        assert err4[:7].max() < 1e-3, err4
        assert np.abs(np.asarray(st4.qvel[0])).max() < 0.6

    def test_joint_friction_holds(self):
        """Coulomb friction holds a joint against small torques (drawer DOF
        props: damping 20, friction 5 — open_drawer.py:162-167)."""
        t = builder.build_tree([
            builder.LinkDef("base"),
            builder.LinkDef("drawer", parent="base", joint_type=JOINT_PRISMATIC,
                            axis=(1, 0, 0), lower=0, upper=0.5, damping=20.0,
                            friction=5.0, armature=0.005,
                            mass=2.0, inertia=(0.01,) * 3),
        ])
        spec = t.spec
        st = tree_state(spec, [0.1])
        # constant 3 N pull < 5 N friction: must not move
        st1, _ = simulate(spec, st, 480, 1 / 960, tau=3.0)
        assert abs(float(st1.qpos[0, 0]) - 0.1) < 2e-3
        # 30 N >> friction: must move
        st2, _ = simulate(spec, st, 480, 1 / 960, tau=30.0)
        assert float(st2.qpos[0, 0]) > 0.2


class TestFreeBody:
    def make_cube(self, E=1, half=0.025, density=1000.0):
        m = density * (2 * half) ** 3
        i = m * (2 * half) ** 2 / 6.0
        return FreeBodySpec(
            mass=np.full(E, m, np.float32),
            inertia=np.tile(np.eye(3, dtype=np.float32) * i, (E, 1, 1)),
            half_extents=np.full((E, 3), half, np.float32),
            gravity_scale=np.ones(E, np.float32),
            friction=np.ones(E, np.float32),
        )

    def test_free_fall(self):
        spec = self.make_cube()
        st = FreeBodyState(pos=jnp.array([[0.0, 0, 1.0]]),
                           quat=jnp.array([[0.0, 0, 0, 1]]),
                           linvel=jnp.zeros((1, 3)), angvel=jnp.zeros((1, 3)))
        h = 1 / 960
        step = jax.jit(lambda s: jax.lax.scan(
            lambda c, _: (contact.integrate_free_body(
                spec, c, jnp.zeros((1, 3)), jnp.zeros((1, 3)), h, GRAV), None),
            s, None, length=960)[0])
        st = step(st)
        # semi-implicit Euler: z = 1 − ½gt² − ½ght
        expect = 1.0 - 0.5 * G * 1.0 - 0.5 * G * h
        assert abs(float(st.pos[0, 2]) - expect) < 1e-3

    def test_angular_momentum_free_rotation(self):
        """Torque-free asymmetric top conserves |L| (gyroscopic term)."""
        E = 1
        inertia = np.diag([0.01, 0.02, 0.03]).astype(np.float32)[None]
        spec = FreeBodySpec(mass=np.ones(E, np.float32), inertia=inertia,
                            half_extents=np.full((E, 3), 0.1, np.float32),
                            gravity_scale=np.zeros(E, np.float32),
                            friction=np.ones(E, np.float32))
        st = FreeBodyState(pos=jnp.zeros((1, 3)), quat=jnp.array([[0.0, 0, 0, 1]]),
                           linvel=jnp.zeros((1, 3)),
                           angvel=jnp.array([[3.0, 0.2, 1.0]]))
        from partmanip_tpu.ops import rotations as rot

        def ang_mom(st):
            R = rot.quat_to_mat(st.quat)[0]
            Iw = R @ inertia[0] @ R.T
            return np.asarray(Iw @ np.asarray(st.angvel[0]))

        L0 = ang_mom(st)
        h = 1 / 1920
        step = jax.jit(lambda s: jax.lax.scan(
            lambda c, _: (contact.integrate_free_body(
                spec, c, jnp.zeros((1, 3)), jnp.zeros((1, 3)), h, GRAV), None),
            s, None, length=1920)[0])
        st = step(st)
        L1 = ang_mom(st)
        assert np.linalg.norm(L1 - L0) / np.linalg.norm(L0) < 0.05


class TestBoxSDF:
    def test_outside_face(self):
        d, n = contact.box_sdf(jnp.array([0.5, 0.0, 0.0]), jnp.array([0.2, 0.2, 0.2]))
        assert abs(float(d) - 0.3) < 1e-6
        np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-6)

    def test_outside_corner(self):
        d, n = contact.box_sdf(jnp.array([0.3, 0.3, 0.3]), jnp.array([0.2, 0.2, 0.2]))
        assert abs(float(d) - np.sqrt(3 * 0.01)) < 1e-6
        np.testing.assert_allclose(np.asarray(n), np.ones(3) / np.sqrt(3), atol=1e-5)

    def test_inside(self):
        d, n = contact.box_sdf(jnp.array([0.15, 0.0, 0.0]), jnp.array([0.2, 0.2, 0.2]))
        assert abs(float(d) + 0.05) < 1e-6
        np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-6)


class TestAnalyticBias:
    def test_matches_jvp_reference(self):
        """The closed-form J̇q̇ velocity-product terms equal the
        autodiff-JVP formulation on a random articulated state."""
        built = franka.build_franka(mobile=True)
        spec = built.spec
        D = spec.dof_mask.shape[-1]
        q = jax.random.uniform(jax.random.PRNGKey(5), (3, D), minval=-0.8,
                               maxval=0.8)
        qv = jax.random.normal(jax.random.PRNGKey(6), (3, D))
        st = TreeState(qpos=q, qvel=qv, root_pos=jnp.zeros((3, 3)),
                       root_quat=jnp.tile(jnp.array([0.0, 0, 0, 1]), (3, 1)))
        spec = spec._replace(gravity_scale=np.ones(1, np.float32))
        b1 = dynamics.bias_forces(spec, st, GRAV)
        b2 = dynamics.bias_forces_jvp(spec, st, GRAV)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=1e-4, atol=1e-3)

    def test_matches_on_heterogeneous_object(self):
        t0 = builder.build_tree([
            builder.LinkDef("base", mass=1.0, inertia=(0.1,) * 3),
            builder.LinkDef("arm", parent="base", joint_type=JOINT_REVOLUTE,
                            origin_pos=(0, 0, 0.5), axis=(0, 1, 0),
                            lower=-5, upper=5, mass=2.0, com=(0.3, 0, 0),
                            inertia=(0.02,) * 3),
            builder.LinkDef("slider", parent="arm", joint_type=JOINT_PRISMATIC,
                            origin_pos=(0.5, 0, 0), axis=(1, 0, 0),
                            lower=-1, upper=1, mass=0.5, inertia=(0.01,) * 3),
        ])
        spec = t0.spec
        st = TreeState(qpos=jnp.array([[0.7, 0.2]]),
                       qvel=jnp.array([[1.5, -0.8]]),
                       root_pos=jnp.zeros((1, 3)),
                       root_quat=jnp.array([[0.0, 0, 0, 1]]))
        b1 = dynamics.bias_forces(spec, st, GRAV)
        b2 = dynamics.bias_forces_jvp(spec, st, GRAV)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=1e-4, atol=1e-4)
