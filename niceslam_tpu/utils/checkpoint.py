"""Checkpoint / resume via orbax.

The reference declares ``ckpt_freq`` in config but never reads it and has no
checkpoint code (reference: config/nice_slam.yaml:59, SURVEY.md §5
"Checkpoint / resume"). This implements the intended behavior: periodic
snapshots of {grids, decoder params, keyframe DB, trajectory} and restart
from the last published snapshot — which is also the failure-recovery story
for multi-host runs (SPMD slices die whole; recovery = reload + resume,
SURVEY.md §5 "Failure detection").
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..slam.state import KeyframeDB, MapState


def save_checkpoint(
    path: str,
    state: MapState,
    est_c2w,
    gt_c2w,
    frame_idx: int,
    bounds: Optional[Dict[str, Any]] = None,
    scene_bound=None,
):
    """Snapshot the SLAM state.

    ``bounds``/``scene_bound`` persist the per-level sampling bounds — they
    are NOT derivable from config when the grids were Z-padded for a
    ('map','kf') mesh (parallel/runtime.attach extends the z bound with the
    padding), so restoring a padded snapshot without them silently skews
    every consumer's world->voxel mapping (r2 ADVICE medium).
    """
    path = os.path.abspath(path)
    ckpter = ocp.PyTreeCheckpointer()
    payload = {
        "grids": state.grids,
        "decoders": state.decoders,
        "keyframes": state.keyframes._asdict(),
        "version": state.version,
        "est_c2w": np.asarray(est_c2w),
        "gt_c2w": np.asarray(
            [g if g is not None else np.full((4, 4), np.nan) for g in gt_c2w]
        ),
        "frame_idx": np.asarray(frame_idx),
    }
    if bounds is not None:
        payload["bounds"] = {k: np.asarray(v) for k, v in bounds.items()}
    if scene_bound is not None:
        payload["scene_bound"] = np.asarray(scene_bound)
    ckpter.save(path, payload, force=True)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Restore a snapshot as HOST arrays (device placement happens lazily).

    Restoring to numpy keeps checkpoints topology-portable: a snapshot
    written on a TPU host restores on a CPU-only analysis box or a
    different mesh shape (orbax otherwise demands concrete shardings).
    """
    path = os.path.abspath(path)
    ckpter = ocp.PyTreeCheckpointer()
    meta = ckpter.metadata(path)
    tree = getattr(meta, "item_metadata", None) or getattr(meta, "tree", meta)
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    payload = ckpter.restore(path, restore_args=restore_args)
    kf = payload["keyframes"]
    state = MapState(
        grids=payload["grids"],
        decoders=payload["decoders"],
        keyframes=KeyframeDB(**kf),
        version=payload["version"],
    )
    gt_list = [
        None if np.isnan(g).any() else np.asarray(g)
        for g in payload["gt_c2w"]
    ]
    return {
        "state": state,
        "est_c2w": [np.asarray(p) for p in payload["est_c2w"]],
        "gt_c2w": gt_list,
        "frame_idx": int(payload["frame_idx"]),
        # absent in pre-r3 snapshots; restore() falls back to config-derived
        # bounds then (valid only for never-padded grids).
        "bounds": payload.get("bounds"),
        "scene_bound": payload.get("scene_bound"),
    }
