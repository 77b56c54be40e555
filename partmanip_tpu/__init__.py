"""partmanip_tpu — a TPU-native rebuild of PKU-EPIC/PartManip.

A from-scratch JAX/XLA/Pallas framework providing:

- a batched articulated rigid-body simulator (Featherstone CRBA/RNEA dynamics,
  implicitly-integrated PD position drives, SDF penalty contacts) replacing
  Isaac Gym's PhysX pipeline (reference: ``tasks/hand_base.py``,
  ``utils/config.py:9-33``);
- the two PartManip tasks, ``grasp_cube`` and ``open_drawer``, with
  state-level-faithful reward/reset/observation semantics
  (reference: ``tasks/grasp_cube.py``, ``tasks/open_drawer.py``);
- PPO / DAgger / BC learners with the reference's GAE, KL-gate and
  RMS-normalization semantics (reference: ``algorithms/``);
- an XLA-native vision stack: SDF raymarched depth cameras, TSDF fusion,
  farthest-point-sampled point clouds (reference: ``utils/depth2tsdf.py``,
  ``utils/mesh2sdf.py``);
- env-axis data parallelism over a ``jax.sharding.Mesh`` with XLA collectives.

Everything on the compute path is a pure function over explicit state pytrees,
jitted end-to-end; envs are a (shardable) leading axis.
"""

__version__ = "0.1.0"
