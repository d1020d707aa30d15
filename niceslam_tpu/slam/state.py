"""SLAM state: explicit immutable pytrees instead of shared mutable dicts.

The reference shares a ``c10::Dict<string, Tensor>`` of grids by value
between tracker and mapper with no synchronization story (reference:
src/main.cpp:35-78; vestigial sync fields src/Tracker.cpp:11-13 — SURVEY.md
§5 "Race detection"). Here the whole map is one versioned pytree: the mapper
returns a new ``MapState``, the tracker pins a snapshot per frame, and JAX's
functional purity removes data races by construction.

The keyframe database is a fixed-capacity ring buffer (static shapes under
jit) replacing the reference's unbounded ``std::vector<KeyFrame>``
(include/Mapper.h:34; SURVEY.md §7.3 "Dynamic keyframe structures").
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.hierarchy import GridConfig, init_grids
from ..models.decoders import DecoderConfig, init_decoders


class KeyframeDB(NamedTuple):
    """Fixed-capacity keyframe ring buffer. All arrays leading dim = capacity.

    Equivalent of the reference KeyFrame struct {idx, color, depth, est_c2w,
    gt_c2w} (include/Mapper.h:11-15) + the keyframe list.
    """

    colors: jnp.ndarray  # [K, H, W, 3] float32
    depths: jnp.ndarray  # [K, H, W] float32
    est_c2w: jnp.ndarray  # [K, 4, 4]
    gt_c2w: jnp.ndarray  # [K, 4, 4]
    frame_idx: jnp.ndarray  # [K] int32, -1 = empty slot
    count: jnp.ndarray  # [] int32

    @property
    def capacity(self) -> int:
        return self.colors.shape[0]

    def valid_mask(self) -> jnp.ndarray:
        return self.frame_idx >= 0


def init_keyframe_db(capacity: int, H: int, W: int) -> KeyframeDB:
    return KeyframeDB(
        colors=jnp.zeros((capacity, H, W, 3), jnp.float32),
        depths=jnp.zeros((capacity, H, W), jnp.float32),
        est_c2w=jnp.tile(jnp.eye(4), (capacity, 1, 1)),
        gt_c2w=jnp.tile(jnp.eye(4), (capacity, 1, 1)),
        frame_idx=jnp.full((capacity,), -1, jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def add_keyframe(
    db: KeyframeDB,
    color: jnp.ndarray,
    depth: jnp.ndarray,
    est_c2w: jnp.ndarray,
    gt_c2w: jnp.ndarray,
    frame_idx,
) -> KeyframeDB:
    """Append at the ring position ``count % capacity`` (jit-safe)."""
    slot = db.count % db.capacity
    return KeyframeDB(
        colors=db.colors.at[slot].set(color),
        depths=db.depths.at[slot].set(depth),
        est_c2w=db.est_c2w.at[slot].set(est_c2w),
        gt_c2w=db.gt_c2w.at[slot].set(gt_c2w),
        frame_idx=db.frame_idx.at[slot].set(jnp.asarray(frame_idx, jnp.int32)),
        count=db.count + 1,
    )


class MapState(NamedTuple):
    """The full published map: grids + decoders + keyframes + trajectory."""

    grids: Dict[str, jnp.ndarray]
    decoders: Dict
    keyframes: KeyframeDB
    version: jnp.ndarray  # [] int32 — bumped on every mapper publish


def init_state(
    key: jax.Array,
    bound: np.ndarray,
    H: int,
    W: int,
    grid_cfg: GridConfig = GridConfig(),
    dec_cfg: DecoderConfig = DecoderConfig(),
    kf_capacity: int = 128,
):
    """Returns ``(MapState, bounds, adjusted_bound)``."""
    kg, kd = jax.random.split(key)
    grids, bounds, bound_adj = init_grids(kg, bound, grid_cfg)
    params = init_decoders(kd, dec_cfg)
    state = MapState(
        grids=grids,
        decoders=params,
        keyframes=init_keyframe_db(kf_capacity, H, W),
        version=jnp.zeros((), jnp.int32),
    )
    return state, bounds, bound_adj
