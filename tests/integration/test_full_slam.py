"""Full track+map loop on the synthetic scene: trajectory must stay sane."""
import numpy as np

from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
from niceslam_tpu.slam.system import NiceSLAM

from tests.integration.conftest import tiny_config


def test_full_slam_bounded_drift():
    cfg = tiny_config(gt_camera=False)
    # Per-frame motion must sit in the tracker's budget (few cm / frame —
    # Adam at lr=1e-3 x 15 iters moves translation ~1.5 cm per frame, plus
    # the constant-speed warm start): arc_fraction scaled to 6 frames.
    reader = SyntheticBoxReader(
        cfg, n_frames=6, trajectory_kwargs=dict(arc_fraction=0.05)
    )
    slam = NiceSLAM(cfg, reader=reader)
    res = slam.run(6)
    est = np.asarray([p[:3, 3] for p in res["est_c2w"]])
    gt = np.asarray([p[:3, 3] for p in res["gt_c2w"]])
    per_frame = np.linalg.norm(est - gt, axis=1)
    # Coarse map + 15 iters/frame: drift must stay well under the per-frame
    # camera motion budget (divergence -> meters within a few frames).
    assert per_frame.max() < 0.3, per_frame
    assert "ate_rmse" in res
    assert res["ate_rmse"] < 0.2, res["ate_rmse"]
