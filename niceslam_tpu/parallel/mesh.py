"""Device mesh + sharding annotations for multi-chip scaling.

The reference has zero distributed code — everything is pinned to CUDA:0
(reference: src/main.cpp:11-12, src/Renderer.cpp:31; SURVEY.md §2.2) — so
this layer is new design, per the BASELINE north star: keyframe-bundle /
ray-batch data parallelism with psum-reduced mapping gradients, riding ICI
collectives that XLA inserts (GSPMD), not hand-written comms.

Mechanism: a 1-D ``('kf',)`` mesh in Auto axis mode; the mapper's flattened
ray batch gets a ``with_sharding_constraint(P('kf'))`` annotation inside the
jitted step (see slam/mapper.py), params stay replicated, and XLA
automatically partitions the render + inserts the all-reduce on the
replicated-param gradients. The same jitted program runs single-chip (no
mesh active -> annotations are no-ops).

Scaling expectation: mapping compute is embarrassingly parallel over rays
(each ray touches its own grid corners), so the only collective per step is
one psum over grid+decoder grads — the ≥70%-at-2-hosts BASELINE target is a
bandwidth statement about that psum vs. per-chip render time.
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax
from jax.sharding import AxisType, Mesh, PartitionSpec as P

_ACTIVE: Optional[Mesh] = None

RAY_AXIS = "kf"


def make_slam_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the ray/keyframe axis (Auto mode)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(
        np.asarray(devices), (RAY_AXIS,), axis_types=(AxisType.Auto,)
    )


def make_map_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the map-block (grid Z-shard) axis (grid/shard.py)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), ("map",))


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE


@contextmanager
def activate(mesh: Mesh):
    """Install the mesh for jit tracing; shard_rays becomes live inside."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = mesh
    try:
        with jax.set_mesh(mesh):
            yield mesh
    finally:
        _ACTIVE = prev


def replicate(tree):
    """Pin every leaf as fully replicated (identity without a mesh).

    Applied to the mapper's outputs: without it GSPMD may auto-tile the
    updated grids across the mesh in layouts that the host-side driver (and
    jax's NamedSharding recovery) can't consume.
    """
    if _ACTIVE is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, P()), tree
    )


def shard_rays(tree, axis: str = RAY_AXIS):
    """Annotate leading (ray) axis of every leaf as sharded over the mesh.

    No-op when no mesh is active, so the mapper stays a single source for
    both single-chip and multi-chip execution.
    """
    if _ACTIVE is None:
        return tree

    def ann(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, spec)

    return jax.tree_util.tree_map(ann, tree)
