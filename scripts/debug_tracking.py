"""Isolate the tracker: build a map from GT poses, then track a perturbed pose."""
import os, sys, time

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
from niceslam_tpu.config.schema import SLAMConfig, CamConfig, TrackingConfig, MappingConfig, GridLenConfig
from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
from niceslam_tpu.slam.system import NiceSLAM
from niceslam_tpu.slam.tracker import track_frame, TrackConfig
from niceslam_tpu.render.renderer import render_rays
from niceslam_tpu.core.rays import rays_for_image

cfg = SLAMConfig(
    dataset="synthetic",
    bound=((-2.2, 2.2), (-2.2, 2.2), (-2.2, 2.2)),
    cam=CamConfig(H=48, W=64, fx=40.0, fy=40.0, cx=32.0, cy=24.0),
    grid_len=GridLenConfig(coarse=1.5, middle=0.8, fine=0.4, color=0.4, bound_divisable=0.4),
    tracking=TrackingConfig(pixels=200, iters=20, ignore_edge_H=4, ignore_edge_W=4, lr=2e-3, gt_camera=True),
    mapping=MappingConfig(
        pixels=500, iters_first=300, iters=60, every_frame=1,
        keyframe_every=2, mapping_window_size=4, max_keyframes=16,
        color_refine=False, BA=False,
    ),
    coarse=False,
    verbose=False,
)
reader = SyntheticBoxReader(cfg, n_frames=5)
slam = NiceSLAM(cfg, reader=reader)
slam.run(5)  # builds map with GT poses

# Render-depth quality check at frame 2 GT pose:
f = reader[2]
ro, rd = rays_for_image(slam.intr, jnp.asarray(f.gt_c2w))
sel = np.random.default_rng(0).integers(0, slam.intr.H * slam.intr.W, 500)
ro_f = ro.reshape(-1, 3)[sel]; rd_f = rd.reshape(-1, 3)[sel]
gt_d = jnp.asarray(f.depth.reshape(-1)[sel])
out = render_rays(slam.state.decoders, slam.state.grids, slam.bounds, slam.scene_bound, ro_f, rd_f, gt_d, "color", slam.rcfg)
print("depth err mean:", float(jnp.mean(jnp.abs(out.depth - gt_d))),
      "depth_var mean:", float(jnp.mean(out.depth_var)),
      "rgb err:", float(jnp.mean(jnp.abs(out.rgb - jnp.asarray(f.color.reshape(-1,3)[sel])))))

# Perturb GT pose of frame 2 and track.
pert = f.gt_c2w.copy()
pert[:3, 3] += np.array([0.03, -0.02, 0.04], np.float32)
tcfg = TrackConfig(pixels=200, iters=20, lr=2e-3, ignore_edge_H=4, ignore_edge_W=4)
c2w, losses = track_frame(
    slam.state.decoders, slam.state.grids, slam.bounds, slam.scene_bound,
    slam.intr, jnp.asarray(f.color), jnp.asarray(f.depth), jnp.asarray(pert),
    jax.random.PRNGKey(1), tcfg, slam.rcfg,
)
c2w = np.asarray(c2w)
print("losses:", np.asarray(losses))
print("init pos err:", np.linalg.norm(pert[:3,3]-f.gt_c2w[:3,3]),
      "final pos err:", np.linalg.norm(c2w[:3,3]-f.gt_c2w[:3,3]))
print("rot err final:", np.linalg.norm(c2w[:3,:3]-f.gt_c2w[:3,:3]))
