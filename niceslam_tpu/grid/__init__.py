from .hierarchy import GridConfig, init_grids, adjust_bound  # noqa: F401
