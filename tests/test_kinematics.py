import numpy as np
import jax
import jax.numpy as jnp

from partmanip_tpu.sim import builder, kinematics, franka
from partmanip_tpu.sim.types import JOINT_PRISMATIC, JOINT_REVOLUTE, TreeState


def make_state(spec, E, qpos=None, root_pos=None, root_quat=None):
    D = spec.dof_mask.shape[-1]
    q = jnp.zeros((E, D)) if qpos is None else jnp.broadcast_to(jnp.asarray(qpos), (E, D))
    rp = jnp.zeros((E, 3)) if root_pos is None else jnp.broadcast_to(jnp.asarray(root_pos), (E, 3))
    rq = jnp.tile(jnp.array([0.0, 0, 0, 1]), (E, 1)) if root_quat is None else \
        jnp.broadcast_to(jnp.asarray(root_quat), (E, 4))
    return TreeState(qpos=q, qvel=jnp.zeros_like(q), root_pos=rp, root_quat=rq)


class TestFrankaFK:
    def setup_method(self):
        self.built = franka.build_franka(mobile=False)
        self.spec = jax.tree.map(jnp.asarray, self.built.spec)

    def test_counts(self):
        assert self.built.spec.link_mask.sum() == 13  # link0-7,hand,2 fingers,2 tips
        assert self.built.spec.dof_mask.sum() == 9
        mob = franka.build_franka(mobile=True)
        assert mob.spec.link_mask.sum() == 16
        assert mob.spec.dof_mask.sum() == 12

    def test_zero_config_hand_pose(self):
        """Flange/hand position at q=0 is the textbook Franka (0.088, 0, 0.926)."""
        st = make_state(self.spec, 2)
        fk = kinematics.forward_kinematics(self.spec, st)
        li = self.built.link_index
        hand = np.asarray(fk.link_pos[0, li["panda_hand"]])
        np.testing.assert_allclose(hand, [0.088, 0, 0.926], atol=1e-5)
        # tips: hand z-axis points down at q=0 → below the hand
        tip = 0.5 * (np.asarray(fk.link_pos[0, li["panda_lefttip"]])
                     + np.asarray(fk.link_pos[0, li["panda_righttip"]]))
        np.testing.assert_allclose(tip, [0.088, 0, 0.926 - 0.0584 - 0.0445], atol=1e-5)

    def test_gripper_length_equals_2q(self):
        q = np.zeros(9, np.float32)
        q[-2:] = 0.03
        st = make_state(self.spec, 1, qpos=q)
        fk = kinematics.forward_kinematics(self.spec, st)
        li = self.built.link_index
        lt = fk.link_pos[0, li["panda_lefttip"]]
        rt = fk.link_pos[0, li["panda_righttip"]]
        assert abs(float(jnp.linalg.norm(lt - rt)) - 0.06) < 1e-5

    def test_root_transform(self):
        """Root pose rigidly transforms the whole chain (grasp_cube root:
        pos (0,-0.5,0), quat (0,0,.707,.707) — cfg/tasks/grasp_cube.yaml)."""
        rq = np.array([0, 0, 0.707, 0.707], np.float32)
        rq = rq / np.linalg.norm(rq)
        st0 = make_state(self.spec, 1)
        st1 = make_state(self.spec, 1, root_pos=np.array([0, -0.5, 0], np.float32),
                         root_quat=rq)
        fk0 = kinematics.forward_kinematics(self.spec, st0)
        fk1 = kinematics.forward_kinematics(self.spec, st1)
        # 90° about z: (x, y, z) → (-y, x, z), then translate
        p0 = np.asarray(fk0.link_pos[0])
        p1 = np.asarray(fk1.link_pos[0])
        expect = np.stack([-p0[:, 1], p0[:, 0], p0[:, 2]], -1) + [0, -0.5, 0]
        np.testing.assert_allclose(p1, expect, atol=1e-5)

    def test_jacobian_matches_finite_difference(self):
        key = jax.random.PRNGKey(0)
        built = franka.build_franka(mobile=True)
        spec = jax.tree.map(jnp.asarray, built.spec)
        D = spec.dof_mask.shape[-1]
        q0 = jax.random.uniform(key, (1, D), minval=-0.5, maxval=0.5)

        li = built.link_index
        idx = jnp.array([[li["panda_lefttip"], li["panda_hand"]]])

        def tip_pos(q):
            st = make_state(spec, 1, qpos=q)
            fk = kinematics.forward_kinematics(spec, st)
            return fk.link_pos[0, idx[0]]  # [2, 3]

        st = make_state(spec, 1, qpos=q0)
        fk = kinematics.forward_kinematics(spec, st)
        J = kinematics.frame_jacobian(spec, fk, idx)  # [1, 2, 6, D]
        Jv = np.asarray(J[0, :, :3, :])

        eps = 1e-3
        for d in range(D):
            dq = q0.at[0, d].add(eps)
            dq2 = q0.at[0, d].add(-eps)
            fd = (tip_pos(dq) - tip_pos(dq2)) / (2 * eps)
            np.testing.assert_allclose(Jv[:, :, d], np.asarray(fd), atol=1e-3)

    def test_angular_jacobian_finite_difference(self):
        built = self.built
        spec = self.spec
        D = spec.dof_mask.shape[-1]
        q0 = jax.random.uniform(jax.random.PRNGKey(3), (1, D), minval=-0.4, maxval=0.4)
        li = built.link_index
        idx = jnp.array([[li["panda_hand"]]])

        def hand_quat(q):
            st = make_state(spec, 1, qpos=q)
            return kinematics.forward_kinematics(spec, st).link_quat[0, idx[0, 0]]

        st = make_state(spec, 1, qpos=q0)
        fk = kinematics.forward_kinematics(spec, st)
        Jw = np.asarray(kinematics.frame_jacobian(spec, fk, idx)[0, 0, 3:, :])

        from partmanip_tpu.ops import rotations as rot
        eps = 1e-3
        for d in range(D):
            qp = hand_quat(q0.at[0, d].add(eps))
            qm = hand_quat(q0.at[0, d].add(-eps))
            # ω = 2 * vec(dq ⊗ q*) / dt
            dq = (qp - qm) / (2 * eps)
            w = 2 * rot.quat_mul(dq, rot.quat_conjugate(hand_quat(q0)))[:3]
            np.testing.assert_allclose(Jw[:, d], np.asarray(w), atol=1e-3)


class TestHeterogeneousTrees:
    def test_per_env_topology(self):
        """Two different padded objects batched into one spec FK correctly."""
        # env 0: single prismatic drawer; env 1: revolute door on a taller base
        t0 = builder.build_tree(
            [
                builder.LinkDef("base", mass=1.0, inertia=(0.1, 0.1, 0.1)),
                builder.LinkDef("drawer", parent="base", joint_type=JOINT_PRISMATIC,
                                origin_pos=(0, 0, 0.3), axis=(1, 0, 0),
                                lower=0.0, upper=0.4, mass=1.0,
                                inertia=(0.01,) * 3),
                builder.LinkDef("handle", parent="drawer",
                                origin_pos=(0.2, 0, 0)),
            ],
            pad_links=4, pad_dofs=2,
        )
        t1 = builder.build_tree(
            [
                builder.LinkDef("base", mass=1.0, inertia=(0.1, 0.1, 0.1)),
                builder.LinkDef("shelf", parent="base", origin_pos=(0, 0, 0.1)),
                builder.LinkDef("door", parent="shelf", joint_type=JOINT_REVOLUTE,
                                origin_pos=(0, 0.25, 0.5), axis=(0, 0, 1),
                                lower=0.0, upper=1.5, mass=1.0,
                                inertia=(0.01,) * 3),
                builder.LinkDef("knob", parent="door", origin_pos=(0.3, 0, 0)),
            ],
            pad_links=4, pad_dofs=2,
        )
        spec = jax.tree.map(jnp.asarray, builder.stack_trees([t0.spec, t1.spec]))
        q = jnp.array([[0.25, 0.0], [np.pi / 2, 0.0]])
        st = TreeState(qpos=q, qvel=jnp.zeros_like(q),
                       root_pos=jnp.zeros((2, 3)),
                       root_quat=jnp.tile(jnp.array([0.0, 0, 0, 1]), (2, 1)))
        fk = kinematics.forward_kinematics(spec, st)
        # env0: handle at drawer origin +0.2x, drawer slid +0.25x, z 0.3
        np.testing.assert_allclose(fk.link_pos[0, 2], [0.45, 0, 0.3], atol=1e-5)
        # env1: door rotated 90° about z at (0, 0.25, 0.6): knob offset
        # (0.3,0,0) → rotated to (0,0.3,0) → (0, 0.55, 0.6)
        np.testing.assert_allclose(fk.link_pos[1, 3], [0, 0.55, 0.6], atol=1e-5)

    def test_point_jacobian_prismatic(self):
        t0 = builder.build_tree(
            [
                builder.LinkDef("base", mass=1.0, inertia=(0.1,) * 3),
                builder.LinkDef("slider", parent="base", joint_type=JOINT_PRISMATIC,
                                axis=(0, 1, 0), lower=-1, upper=1, mass=1.0,
                                inertia=(0.01,) * 3),
            ]
        )
        spec = jax.tree.map(jnp.asarray, t0.spec)
        st = TreeState(qpos=jnp.array([[0.3]]), qvel=jnp.zeros((1, 1)),
                       root_pos=jnp.zeros((1, 3)),
                       root_quat=jnp.array([[0.0, 0, 0, 1]]))
        fk = kinematics.forward_kinematics(spec, st)
        pts = fk.link_pos[:, 1:2] + jnp.array([[[5.0, 5.0, 5.0]]])
        Jv = kinematics.point_jacobian(spec, fk, jnp.array([[1]]), pts)
        np.testing.assert_allclose(Jv[0, 0, :, 0], [0, 1, 0], atol=1e-6)
