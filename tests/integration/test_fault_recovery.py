"""Fault injection + recovery (SURVEY.md §5 "Failure detection").

A corrupted mapping step (NaN loss — the signature of a diverged or faulted
host in a psum ring) must NOT be published: the tracker keeps the last good
map snapshot and the system keeps running. Checkpoint restore must resume a
run losslessly.
"""
import os

import jax.numpy as jnp
import numpy as np

from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
from niceslam_tpu.slam.system import NiceSLAM

from tests.integration.conftest import tiny_config


def test_nan_mapping_step_is_rejected():
    cfg = tiny_config(gt_camera=True)
    reader = SyntheticBoxReader(cfg, n_frames=8)
    slam = NiceSLAM(cfg, reader=reader)
    faults = []

    def corrupt(idx, outs):
        grids, decoders, cams, losses = outs
        if idx == 5:  # fault exactly one mapping event
            faults.append(idx)
            grids = {k: g * jnp.nan for k, g in grids.items()}
            losses = losses * jnp.nan
        return grids, decoders, cams, losses

    slam.fault_hook = corrupt
    slam.run(8)

    assert faults and all(f == 5 for f in faults)
    # the published map survived the fault: no NaNs anywhere
    for lvl, g in slam.state.grids.items():
        assert np.isfinite(np.asarray(g)).all(), lvl
    # and the rejection was observable
    events = [r["event"] for r in slam.log.records]
    assert "map_rejected" in events


def test_ba_fault_rollback_contains_poisoned_poses():
    """ADVICE r1 high #2: under BA, a diverged async mapping event writes
    possibly-NaN poses into keyframes.est_c2w and the trajectory tail; the
    deferred rollback must restore those too, not just grids/decoders."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        sync_method="async",
        mapping=dataclasses.replace(
            cfg.mapping,
            BA=True,
            keyframe_every=1,
            iters_first=40,
            iters=12,
        ),
    )
    reader = SyntheticBoxReader(cfg, n_frames=9)
    slam = NiceSLAM(cfg, reader=reader)
    faults = []

    def corrupt(idx, outs):
        grids, decoders, cams, losses = outs
        # fault exactly one BA-enabled mapping event (BA needs >4 keyframes)
        if idx == 6 and not faults:
            faults.append(idx)
            cams = cams * jnp.nan
            grids = {k: g * jnp.nan for k, g in grids.items()}
            losses = losses * jnp.nan
        return grids, decoders, cams, losses

    slam.fault_hook = corrupt
    slam.run(9)

    assert faults == [6]
    events = [r["event"] for r in slam.log.records]
    assert "map_rejected" in events
    # keyframe poses survived the BA write-back of the faulted event
    kf_poses = np.asarray(slam.state.keyframes.est_c2w)
    assert np.isfinite(kf_poses).all()
    # trajectory has no poisoned poses and the map is clean
    for p in slam.est_c2w:
        assert np.isfinite(np.asarray(p)).all()
    for lvl, g in slam.state.grids.items():
        assert np.isfinite(np.asarray(g)).all(), lvl


def test_checkpoint_resume_continues(tmp_path):
    from niceslam_tpu.utils.checkpoint import save_checkpoint

    cfg = tiny_config(gt_camera=True)
    reader = SyntheticBoxReader(cfg, n_frames=8)

    slam = NiceSLAM(cfg, reader=reader)
    slam.n_imgs = 8
    for i in range(6):
        slam.step(reader[i])
    ck = os.path.join(tmp_path, "ck")
    save_checkpoint(ck, slam.state, slam.est_c2w, slam.gt_c2w, 5)
    ref_version = int(slam.state.version)

    fresh = NiceSLAM(cfg, reader=reader)
    fresh.n_imgs = 8
    start = fresh.restore(ck)
    assert start == 6
    assert len(fresh.est_c2w) == 6
    assert int(fresh.state.version) == ref_version
    # ADVICE r1 high #1: restore() must rebuild the host mirrors of the
    # keyframe DB, or window slots / keyframe admission silently diverge.
    assert fresh._kf_count == slam._kf_count
    np.testing.assert_array_equal(fresh._kf_slot_frame, slam._kf_slot_frame)
    assert fresh._is_keyframe(0) == slam._is_keyframe(0)
    for i in range(start, 8):
        fresh.step(reader[i])
    assert len(fresh.est_c2w) == 8
    res = fresh.result()
    assert res["ate_rmse"] < 0.2
