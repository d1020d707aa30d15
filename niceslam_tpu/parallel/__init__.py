from .mesh import make_slam_mesh, activate, shard_rays, active_mesh  # noqa: F401
