from . import pose, rays, sampling, compositing  # noqa: F401
