"""Hierarchical feature-grid store: coarse / middle / fine / color volumes.

TPU-native equivalent of the grid construction inlined in the reference entry
point (reference: src/main.cpp:33-78): four dense voxel volumes sized from
the scene bound divided by per-level voxel length, feature dim 32, Gaussian
init (std 0.01; fine level 1e-4). Differences by design:

- layout is channel-last ``[Z, Y, X, C]`` (gather-friendly on TPU; see
  ops/trilinear.py) instead of ``[1, C, Z, Y, X]``;
- the scene bound comes from config, not five hard-coded copies
  (SURVEY.md §2.9.11), and is snapped so its extent divides
  ``bound_divisable`` (config/nice_slam.yaml grid_len.bound_divisable);
- the coarse level samples against an origin-scaled enlarged bound
  (coarse_bound_enlarge = 2, matching upstream semantics);
- grids live in an immutable pytree (``dict[str, Array]``) — the mapper
  returns updated grids instead of mutating a shared c10::Dict.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LEVELS = ("coarse", "middle", "fine", "color")


class GridConfig(NamedTuple):
    coarse_len: float = 2.0
    middle_len: float = 0.32
    fine_len: float = 0.16
    color_len: float = 0.16
    bound_divisable: float = 0.32
    c_dim: int = 32
    coarse_bound_enlarge: float = 2.0

    def level_len(self, level: str) -> float:
        return {
            "coarse": self.coarse_len,
            "middle": self.middle_len,
            "fine": self.fine_len,
            "color": self.color_len,
        }[level]


def adjust_bound(bound: np.ndarray, divisable: float) -> np.ndarray:
    """Snap the upper bound so the extent is a multiple of ``divisable``."""
    bound = np.asarray(bound, np.float32).copy()
    extent = bound[:, 1] - bound[:, 0]
    bound[:, 1] = (
        np.floor(extent / divisable).astype(np.int64) + 1
    ) * divisable + bound[:, 0]
    return bound


def grid_shape(bound: np.ndarray, voxel_len: float, enlarge: float = 1.0) -> Tuple[int, int, int]:
    """``(Z, Y, X)`` voxel counts for one level (truncating division, as the
    reference's int casts at src/main.cpp:38-44 do)."""
    extent = (bound[:, 1] - bound[:, 0]) * enlarge
    nx, ny, nz = (int(extent[0] / voxel_len), int(extent[1] / voxel_len), int(extent[2] / voxel_len))
    return (max(nz, 2), max(ny, 2), max(nx, 2))


def init_grids(
    key: jax.Array,
    bound: np.ndarray,
    cfg: GridConfig = GridConfig(),
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], np.ndarray]:
    """Build the four feature grids.

    Returns ``(grids, bounds, bound)``: per-level volumes ``[Z, Y, X, C]``,
    the per-level sampling bounds (coarse uses the origin-scaled enlarged
    bound), and the divisibility-adjusted scene bound.
    """
    bound = adjust_bound(bound, cfg.bound_divisable)
    keys = jax.random.split(key, len(LEVELS))
    grids: Dict[str, jnp.ndarray] = {}
    bounds: Dict[str, jnp.ndarray] = {}
    for lvl, k in zip(LEVELS, keys):
        enlarge = cfg.coarse_bound_enlarge if lvl == "coarse" else 1.0
        shape = grid_shape(bound, cfg.level_len(lvl), enlarge)
        std = 1e-4 if lvl == "fine" else 0.01
        grids[lvl] = jax.random.normal(k, (*shape, cfg.c_dim), jnp.float32) * std
        bounds[lvl] = jnp.asarray(bound * enlarge)
    return grids, bounds, bound
