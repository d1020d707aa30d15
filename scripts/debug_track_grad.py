"""Probe tracking-loss landscape & gradient sanity on a GT-built map."""
import os, sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
from niceslam_tpu.config.schema import SLAMConfig, CamConfig, TrackingConfig, MappingConfig, GridLenConfig
from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
from niceslam_tpu.slam.system import NiceSLAM
from niceslam_tpu.slam.tracker import tracking_loss, TrackConfig
from niceslam_tpu.core.pose import tensor_from_camera

cfg = SLAMConfig(
    dataset="synthetic",
    bound=((-2.2, 2.2), (-2.2, 2.2), (-2.2, 2.2)),
    cam=CamConfig(H=48, W=64, fx=40.0, fy=40.0, cx=32.0, cy=24.0),
    grid_len=GridLenConfig(coarse=1.5, middle=0.8, fine=0.4, color=0.4, bound_divisable=0.4),
    tracking=TrackingConfig(gt_camera=True),
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
slam.run(5)

f = reader[2]
gt_cam = np.asarray(tensor_from_camera(jnp.asarray(f.gt_c2w)))
tcfg = TrackConfig(pixels=400, iters=1, lr=1e-3, ignore_edge_H=4, ignore_edge_W=4, handle_dynamic=False)
key = jax.random.PRNGKey(3)

def L(cam):
    return tracking_loss(
        slam.state.decoders, slam.state.grids, slam.bounds, slam.scene_bound,
        slam.intr, jnp.asarray(cam), jnp.asarray(f.color), jnp.asarray(f.depth),
        key, tcfg, slam.rcfg,
    )

# 1) Landscape along tx around GT:
for dx in [-0.08, -0.04, -0.02, 0.0, 0.02, 0.04, 0.08]:
    cam = gt_cam.copy(); cam[4] += dx
    print(f"tx offset {dx:+.3f}: loss {float(L(cam)):9.2f}")

# 2) Gradient descent direction check at offset +0.04:
cam = gt_cam.copy(); cam[4] += 0.04
g = jax.grad(lambda c: L(c))(jnp.asarray(cam))
g = np.asarray(g)
print("grad:", np.round(g, 2))
for step in [1e-5, 1e-4, 1e-3]:
    print(f"step {step}: loss {float(L(cam - step*g)):9.2f}  (base {float(L(cam)):.2f})")
