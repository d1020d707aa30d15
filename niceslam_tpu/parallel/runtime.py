"""Multi-host / multi-chip runtime: process bootstrap + mesh + attachment.

The reference is pinned to one CUDA device with no communication backend of
any kind (reference: src/main.cpp:11-12, src/Renderer.cpp:31; SURVEY.md §2.2
"Communication backend: none") — this layer is the TPU-native design:

- **process bootstrap** (multi-host): ``jax.distributed.initialize`` wires
  N host processes into one JAX runtime; collectives then ride ICI within a
  slice and DCN across slices, compiled by XLA — no hand-written comms.
  Launch one process per host with the same config; see docs/MULTIHOST.md.
- **mesh construction** (config-driven): ``ParallelConfig`` (configs/*.yaml
  ``parallel:`` section) gives the ``('map', 'kf')`` mesh shape — the
  grid-Z-shard axis times the ray-batch axis.
- **attachment**: ``attach(slam)`` Z-pads every feature grid to the map
  axis (edge-replicated, bound-extended: bit-exact for all consumers —
  parallel/sharded_mapper.pad_grid_for_sharding), places them sharded, and
  swaps the system's mapping program for the sharded one.

Fault model (SURVEY.md §5 "Failure detection"): multi-host SPMD is
all-or-nothing — a lost host kills the slice; recovery is driver-level
restart from the last orbax checkpoint (run_slam.py --resume), which the
NaN-guard/rollback machinery keeps consistent.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config.schema import ParallelConfig, SLAMConfig
from .sharded_mapper import (
    MAP_AXIS,
    make_slam_mesh_2d,
    make_sharded_run_schedule,
    pad_grid_for_sharding,
)


def initialize_distributed(
    pcfg: ParallelConfig, process_id: Optional[int] = None
) -> None:
    """Bootstrap the multi-host JAX runtime (no-op for one process).

    ``process_id`` falls back to the NICESLAM_PROCESS_ID env var — the
    launch script sets it per host (docs/MULTIHOST.md).
    """
    if pcfg.n_processes <= 1:
        return
    if process_id is None:
        process_id = int(os.environ.get("NICESLAM_PROCESS_ID", "-1"))
    if process_id < 0:
        raise ValueError(
            "multi-host run needs --process-id or NICESLAM_PROCESS_ID"
        )
    jax.distributed.initialize(
        coordinator_address=pcfg.coordinator,
        num_processes=pcfg.n_processes,
        process_id=process_id,
    )


class MapKfRuntime:
    """('map', 'kf') mesh runtime over however many devices are visible.

    ``map`` = grid-Z-shard extent (memory axis: the map volume no longer
    must fit one chip), ``kf`` = ray-batch extent (compute axis); ``kf=0``
    means "all remaining devices".
    """

    def __init__(self, pcfg: ParallelConfig, devices=None):
        devices = list(jax.devices()) if devices is None else list(devices)
        n_map = max(pcfg.map, 1)
        n_kf = pcfg.kf if pcfg.kf > 0 else max(len(devices) // n_map, 1)
        self.n_map, self.n_kf = n_map, n_kf
        self.mesh = make_slam_mesh_2d(n_map, n_kf, devices)

    @property
    def trivial(self) -> bool:
        return self.n_map * self.n_kf == 1

    def attach(self, slam) -> None:
        """Shard the system's grids over the mesh + install the Z-sharded
        mapping program (slam.run_schedule_fn)."""
        if self.trivial:
            return
        assert slam.cfg.mapping.pixels % self.n_kf == 0, (
            f"mapping.pixels={slam.cfg.mapping.pixels} must divide the kf "
            f"mesh axis ({self.n_kf})"
        )
        self.reattach_grids(slam)
        slam.run_schedule_fn = make_sharded_run_schedule(self.mesh)
        slam._runtime = self  # restore() re-pads/re-shards through this

    def reattach_grids(self, slam) -> None:
        """(Re-)pad and (re-)place the system's grids on the mesh.

        Called at attach time and again after a checkpoint restore: an
        unpadded snapshot gets padded here (bounds extended to match); a
        snapshot already padded for the same map extent passes through
        pad_grid_for_sharding unchanged and is just re-placed sharded.
        """
        if self.trivial:
            return
        grids = {}
        for lvl, g in slam.state.grids.items():
            g, b = pad_grid_for_sharding(
                jnp.asarray(g), jnp.asarray(slam.bounds[lvl]), self.n_map
            )
            slam.bounds[lvl] = b
            grids[lvl] = jax.device_put(
                g, NamedSharding(self.mesh, P(MAP_AXIS))
            )
        slam.state = slam.state._replace(grids=grids)


def setup_runtime(
    cfg: SLAMConfig, process_id: Optional[int] = None
) -> MapKfRuntime:
    """Config-driven entry: bootstrap processes, build the mesh."""
    initialize_distributed(cfg.parallel, process_id)
    return MapKfRuntime(cfg.parallel)
