"""sync_method="async" (upstream concurrent tracker/mapper semantics).

The free-running driver must produce the same quality of trajectory as
strict lockstep (identical programs, only host synchronization differs),
and its deferred NaN guard must roll a whole faulty mapping event back.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
from niceslam_tpu.slam.system import NiceSLAM

from tests.integration.conftest import tiny_config


def test_async_matches_strict_quality():
    cfg_s = tiny_config(gt_camera=False)
    reader = SyntheticBoxReader(
        cfg_s, n_frames=6, trajectory_kwargs=dict(arc_fraction=0.05)
    )
    res_s = NiceSLAM(cfg_s, reader=reader).run(6)

    cfg_a = dataclasses.replace(cfg_s, sync_method="async")
    slam_a = NiceSLAM(cfg_a, reader=reader)
    res_a = slam_a.run(6)

    # Same seed, same programs -> identical trajectories (the sync method
    # changes host blocking, not math).
    np.testing.assert_allclose(
        np.asarray(res_a["est_c2w"]), np.asarray(res_s["est_c2w"]),
        atol=1e-5,
    )
    assert res_a["ate_rmse"] < 0.2
    # deferred loss curves materialized at flush
    assert len(slam_a.track_losses) == 5


def test_async_rejects_faulty_event_with_rollback():
    cfg = dataclasses.replace(tiny_config(gt_camera=True), sync_method="async")
    reader = SyntheticBoxReader(cfg, n_frames=8)
    slam = NiceSLAM(cfg, reader=reader)

    def corrupt(idx, outs):
        grids, decoders, cams, losses = outs
        if idx == 5:
            grids = {k: g * jnp.nan for k, g in grids.items()}
            losses = losses * jnp.nan
        return grids, decoders, cams, losses

    slam.fault_hook = corrupt
    slam.run(8)

    for lvl, g in slam.state.grids.items():
        assert np.isfinite(np.asarray(g)).all(), lvl
    assert "map_rejected" in [r["event"] for r in slam.log.records]
