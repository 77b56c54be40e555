from . import rotations  # noqa: F401
