from .trilinear import sample_grid, normalize_coords  # noqa: F401
