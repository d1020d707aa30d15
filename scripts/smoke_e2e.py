"""Manual end-to-end smoke run on the synthetic box scene (CPU)."""
import os, sys, time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from niceslam_tpu.config.schema import SLAMConfig, CamConfig, TrackingConfig, MappingConfig, GridLenConfig
from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
from niceslam_tpu.slam.system import NiceSLAM

cfg = SLAMConfig(
    dataset="synthetic",
    bound=((-2.2, 2.2), (-2.2, 2.2), (-2.2, 2.2)),
    cam=CamConfig(H=48, W=64, fx=40.0, fy=40.0, cx=32.0, cy=24.0),
    grid_len=GridLenConfig(coarse=1.5, middle=0.8, fine=0.4, color=0.4, bound_divisable=0.4),
    tracking=TrackingConfig(pixels=100, iters=8, ignore_edge_H=4, ignore_edge_W=4, lr=2e-3),
    mapping=MappingConfig(
        pixels=400, iters_first=120, iters=30, every_frame=2,
        keyframe_every=4, mapping_window_size=4, max_keyframes=16,
        color_refine=False,
    ),
    coarse=True,
    verbose=True,
)
reader = SyntheticBoxReader(cfg, n_frames=9)
slam = NiceSLAM(cfg, reader=reader)
t0 = time.time()
res = slam.run()
print("elapsed", time.time() - t0)
print("ate_rmse:", res.get("ate_rmse"))
est = np.asarray([p[:3, 3] for p in res["est_c2w"]])
gt = np.asarray([p[:3, 3] for p in res["gt_c2w"]])
print("pos err per frame:", np.linalg.norm(est - gt, axis=1))
