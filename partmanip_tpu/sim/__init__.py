from . import builder, franka, kinematics, types  # noqa: F401
