"""Tracking diagnostic: loss landscape + depth_var statistics on a fitted map.

Builds a map with GT poses for a few frames, then examines tracking on the
next frame: depth_var distribution at the true pose, pose error after
track_frame from a warm start, and sensitivity to the uncertainty floor."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jaxcache-tpu",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from niceslam_tpu.config.schema import (
        CamConfig, GridLenConfig, MappingConfig, SLAMConfig, TrackingConfig,
    )
    from niceslam_tpu.core import rays as rays_mod
    from niceslam_tpu.core.pose import tensor_from_camera
    from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
    from niceslam_tpu.render.renderer import render_rays
    from niceslam_tpu.slam.system import NiceSLAM
    from niceslam_tpu.slam import tracker as trk

    pretrained = sys.argv[1] if len(sys.argv) > 1 else "models/pretrained_decoders.npz"
    dec_train = sys.argv[2] if len(sys.argv) > 2 else "never"
    n_total = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    n_map = 11
    cfg = SLAMConfig(
        dataset="synthetic",
        bound=((-4.5, 3.82), (-1.5, 2.02), (-3.0, 2.76)),
        cam=CamConfig(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0),
        grid_len=GridLenConfig(),
        tracking=TrackingConfig(pixels=200, iters=10, gt_camera=True),
        mapping=MappingConfig(
            pixels=1000, iters_first=1500, iters=60, every_frame=5,
            keyframe_every=10, mapping_window_size=5, max_keyframes=64,
            color_refine=False,
            decoder_train=dec_train,
        ),
        coarse=True,
        verbose=False,
        sync_method="strict",
        pretrained_middle_fine=pretrained if pretrained != "none" else "",
    )
    reader = SyntheticBoxReader(cfg, n_frames=n_total)
    slam = NiceSLAM(cfg, reader=reader, seed=0)
    slam.run(n_map)
    slam.result()

    f = reader[n_map]
    prev = reader[n_map - 1]
    gt_c2w = jnp.asarray(f.gt_c2w)

    # depth_var stats at the TRUE pose over a pixel batch
    ro_all, rd_all = rays_mod.rays_for_image(slam.intr, gt_c2w)
    rng = np.random.default_rng(0)
    H, W = slam.intr.H, slam.intr.W
    jj = rng.integers(20, H - 20, 1000)
    ii = rng.integers(20, W - 20, 1000)
    out = render_rays(
        slam.state.decoders, slam.state.grids, slam.bounds, slam.scene_bound,
        ro_all[jj, ii], rd_all[jj, ii], jnp.asarray(f.depth)[jj, ii],
        "color", slam.rcfg,
    )
    var = np.asarray(out.depth_var)
    dep = np.asarray(out.depth)
    gtd = np.asarray(f.depth)[jj, ii]
    res = {
        "depth_var_m2": {
            "p10": float(np.percentile(var, 10)),
            "p50": float(np.percentile(var, 50)),
            "p90": float(np.percentile(var, 90)),
        },
        "unc_amp_p50": float(1.0 / np.sqrt(np.percentile(var, 50) + 1e-10)),
        "depth_err_cm_at_gt": float(100 * np.abs(dep - gtd).mean()),
        "depth_err_cm_pcts": {
            p: round(float(100 * np.percentile(np.abs(dep - gtd), p)), 2)
            for p in (10, 50, 90, 99)
        },
        "signed_err_cm_p50": round(
            float(100 * np.percentile(dep - gtd, 50)), 2
        ),
    }

    # track from the warm start the driver would use (constant speed ~ prev)
    tcfg = trk.TrackConfig(pixels=200, iters=10, lr=1e-3)
    init = jnp.asarray(prev.gt_c2w)
    for name, rcfg_pixels in (("base", None),):
        c2w, losses = trk.track_frame(
            slam.state.decoders, slam.state.grids, slam.bounds,
            slam.scene_bound, slam.intr, jnp.asarray(f.color),
            jnp.asarray(f.depth), init, jax.random.PRNGKey(5), tcfg,
            slam.rcfg,
        )
        err0 = float(np.linalg.norm(np.asarray(init)[:3, 3] - f.gt_c2w[:3, 3]))
        err1 = float(
            np.linalg.norm(np.asarray(c2w)[:3, 3] - f.gt_c2w[:3, 3])
        )
        res[name] = {
            "t_err_cm_init": round(100 * err0, 3),
            "t_err_cm_tracked": round(100 * err1, 3),
            "loss_curve": [round(float(x), 2) for x in np.asarray(losses)],
        }
        # Loss comparison at init / tracked / gt poses on IDENTICAL pixels
        from niceslam_tpu.core.pose import tensor_from_camera as t_f_c
        kk = jax.random.PRNGKey(123)
        for tag, pose in (("init", init), ("tracked", c2w),
                          ("gt", gt_c2w)):
            lv = trk.tracking_loss(
                slam.state.decoders, slam.state.grids, slam.bounds,
                slam.scene_bound, slam.intr, t_f_c(jnp.asarray(pose)),
                jnp.asarray(f.color), jnp.asarray(f.depth), kk, tcfg,
                slam.rcfg,
            )
            res[name][f"loss_at_{tag}"] = round(float(lv), 2)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
