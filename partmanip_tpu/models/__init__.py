from . import actor_critic, networks  # noqa: F401
