"""Watch tracking dynamics step by step on a GT-built map."""
import os, sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
import optax
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

for label, use_color, handle_dyn, lr in [
    ("depth+color dyn lr1e-3", True, True, 1e-3),
    ("depth only dyn lr1e-3", False, True, 1e-3),
    ("depth+color dyn lr3e-3", True, True, 3e-3),
]:
    tcfg = TrackConfig(pixels=200, iters=1, lr=lr, ignore_edge_H=4,
                       ignore_edge_W=4, handle_dynamic=handle_dyn,
                       use_color=use_color)
    cam = jnp.asarray(gt_cam.copy()).at[4].add(0.04)
    opt = optax.adam(lr)
    st = opt.init(cam)

    @jax.jit
    def it(cam, st, key):
        loss, g = jax.value_and_grad(lambda c: tracking_loss(
            slam.state.decoders, slam.state.grids, slam.bounds, slam.scene_bound,
            slam.intr, c, jnp.asarray(f.color), jnp.asarray(f.depth),
            key, tcfg, slam.rcfg))(cam)
        up, st = opt.update(g, st, cam)
        return optax.apply_updates(cam, up), st, loss

    errs = []
    key = jax.random.PRNGKey(5)
    for i in range(30):
        key, sk = jax.random.split(key)
        cam, st, loss = it(cam, st, sk)
        errs.append((float(loss), float(jnp.linalg.norm(cam[4:]-gt_cam[4:]))))
    print(label)
    print("  loss:", " ".join(f"{l:.0f}" for l, _ in errs[::3]))
    print("  terr:", " ".join(f"{e*100:.2f}" for _, e in errs[::3]), "cm (start 4.00)")
