"""Tracker/mapper pipeline-role split: tracker pinned to its own device.

SURVEY.md §2.2 PP row (the upstream two-process design as device roles): the
tracker's whole per-frame program runs on the LAST device against a published
map snapshot while the staged mapper owns device 0. Identical math on a
different chip, so the split must be EXACTLY equivalent to the shared-device
run (XLA executables are deterministic per program+device kind).
"""
import jax
import numpy as np
import pytest

from niceslam_tpu.config.schema import (
    CamConfig,
    GridLenConfig,
    MappingConfig,
    ParallelConfig,
    RenderingConfig,
    SLAMConfig,
    TrackingConfig,
)
from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
from niceslam_tpu.slam.system import NiceSLAM


def _cfg(track_role: bool) -> SLAMConfig:
    return SLAMConfig(
        dataset="synthetic",
        bound=((-2.2, 2.2), (-2.2, 2.2), (-2.2, 2.2)),
        cam=CamConfig(H=24, W=32, fx=20.0, fy=20.0, cx=16.0, cy=12.0),
        grid_len=GridLenConfig(
            coarse=1.5, middle=0.5, fine=0.25, color=0.25,
            bound_divisable=0.25,
        ),
        tracking=TrackingConfig(pixels=64, iters=4, gt_camera=False,
                                ignore_edge_H=2, ignore_edge_W=2),
        mapping=MappingConfig(
            pixels=128, iters_first=8, iters=6, every_frame=2,
            keyframe_every=2, mapping_window_size=3, max_keyframes=8,
            color_refine=False, BA=False,
        ),
        rendering=RenderingConfig(N_samples=8, N_surface=4),
        coarse=False,
        verbose=False,
        sync_method="async",  # the mode the split exists for
        parallel=ParallelConfig(track_role=track_role),
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2+ devices")
def test_track_role_matches_shared_device():
    runs = {}
    for role in (False, True):
        cfg = _cfg(role)
        reader = SyntheticBoxReader(cfg, n_frames=6)
        slam = NiceSLAM(cfg, reader=reader, seed=3)
        slam.run(6)
        runs[role] = slam

    a, b = runs[False], runs[True]
    assert b._track_device() is not None  # the split was actually active
    np.testing.assert_allclose(
        np.asarray(a.est_c2w), np.asarray(b.est_c2w), atol=1e-6
    )
    for lvl in a.state.grids:
        np.testing.assert_allclose(
            np.asarray(a.state.grids[lvl]), np.asarray(b.state.grids[lvl]),
            rtol=1e-6, atol=1e-7, err_msg=lvl,
        )
