from . import assets, base, control, grasp_cube  # noqa: F401
