"""Stage-expert placement: the coarse mapper pass on a second device.

SURVEY.md §2.2 EP/PP rows: the coarse pass is parameter-disjoint from the
staged pass (it only touches the coarse grid/decoder), so running it on
device 1 concurrently with device 0 must be EXACTLY equivalent to the
sequential single-device run.
"""
import dataclasses

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


def _cfg(stage_ep: bool) -> SLAMConfig:
    return SLAMConfig(
        dataset="synthetic",
        bound=((-2.2, 2.2), (-2.2, 2.2), (-2.2, 2.2)),
        cam=CamConfig(H=24, W=32, fx=20.0, fy=20.0, cx=16.0, cy=12.0),
        grid_len=GridLenConfig(
            coarse=1.5, middle=0.5, fine=0.25, color=0.25,
            bound_divisable=0.25,
        ),
        tracking=TrackingConfig(pixels=64, iters=4, gt_camera=True,
                                ignore_edge_H=2, ignore_edge_W=2),
        mapping=MappingConfig(
            pixels=128, iters_first=8, iters=6, every_frame=2,
            keyframe_every=2, mapping_window_size=3, max_keyframes=8,
            color_refine=False, BA=False,
        ),
        rendering=RenderingConfig(N_samples=8, N_surface=4),
        coarse=True,
        verbose=False,
        sync_method="strict",
        parallel=ParallelConfig(stage_ep=stage_ep),
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2+ devices")
def test_stage_ep_matches_sequential():
    runs = {}
    for ep in (False, True):
        cfg = _cfg(ep)
        reader = SyntheticBoxReader(cfg, n_frames=6)
        slam = NiceSLAM(cfg, reader=reader, seed=3)
        slam.run(6)
        runs[ep] = slam

    a, b = runs[False], runs[True]
    for lvl in a.state.grids:
        np.testing.assert_allclose(
            np.asarray(a.state.grids[lvl]), np.asarray(b.state.grids[lvl]),
            rtol=1e-6, atol=1e-7, err_msg=lvl,
        )
    np.testing.assert_allclose(
        np.asarray(a.est_c2w), np.asarray(b.est_c2w), atol=1e-6
    )
    # the EP run's coarse grid really lives on device 1 before the merge:
    # observable as identical results with 2 devices active (placement is
    # an implementation detail; equivalence is the contract).
