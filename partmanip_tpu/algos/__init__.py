from . import ppo, rms, storage  # noqa: F401
