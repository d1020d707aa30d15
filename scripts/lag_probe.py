"""Per-frame tracking-lag probe: warm-start error vs tracked error vs gt.

Drives the full SLAM loop frame by frame (strict sync) and, for every frame,
reports the translation error of (a) the constant-speed warm start the
tracker departs from and (b) the tracked pose it lands on — localizing
whether drift comes from the motion model, tracker under-convergence, or
specific frames (e.g. right after mapping events)."""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--pretrained", default="models/pretrained_decoders.npz")
    ap.add_argument("--separate-lr", action="store_true")
    ap.add_argument("--track-iters", type=int, default=10)
    ap.add_argument("--track-pixels", type=int, default=200)
    ap.add_argument("--track-lr", type=float, default=1e-3)
    ap.add_argument("--depth-gate", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

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
    from niceslam_tpu.core.pose import constant_speed_warm_start
    from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
    from niceslam_tpu.slam.system import NiceSLAM

    cfg = SLAMConfig(
        dataset="synthetic",
        bound=((-4.5, 3.82), (-1.5, 2.02), (-3.0, 2.76)),
        cam=CamConfig(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0),
        grid_len=GridLenConfig(),
        tracking=TrackingConfig(
            pixels=args.track_pixels, iters=args.track_iters,
            lr=args.track_lr, seperate_LR=args.separate_lr,
            depth_err_gate=args.depth_gate,
        ),
        mapping=MappingConfig(
            pixels=1000, iters_first=1500, iters=60, every_frame=5,
            keyframe_every=10, mapping_window_size=5, max_keyframes=64,
            color_refine=False, decoder_train="never",
        ),
        coarse=True,
        verbose=False,
        sync_method="strict",
        pretrained_middle_fine=args.pretrained,
    )
    reader = SyntheticBoxReader(cfg, n_frames=args.frames)
    slam = NiceSLAM(cfg, reader=reader, seed=args.seed)
    slam.precompile_async().join()

    rows = []
    for k in range(args.frames):
        f = reader[k]
        # reconstruct the warm start the driver will use
        if k >= 2:
            ws = np.asarray(constant_speed_warm_start(
                jnp.asarray(slam.est_c2w[-1]), jnp.asarray(slam.est_c2w[-2])
            ))
        elif k == 1:
            ws = np.asarray(slam.est_c2w[-1])
        else:
            ws = f.gt_c2w
        slam.step(f)
        est = np.asarray(slam.est_c2w[-1])
        e_ws = 100 * float(np.linalg.norm(ws[:3, 3] - f.gt_c2w[:3, 3]))
        e_tr = 100 * float(np.linalg.norm(est[:3, 3] - f.gt_c2w[:3, 3]))
        # relative-to-previous-est error: what the tracker added THIS frame
        rows.append((k, round(e_ws, 2), round(e_tr, 2),
                     round(e_tr - e_ws, 2), k % 5 == 0))
        print("frame", rows[-1], file=sys.stderr, flush=True)
    try:
        res = slam.result()
        ate = round(100 * res.get("ate_rmse", float("nan")), 3)
    except Exception as ex:  # NaN trajectories crash the Umeyama SVD
        ate = f"error: {ex}"
    print(json.dumps({
        "ate_rmse_cm": ate,
        "rows (k, warmstart_err, tracked_err, delta, mapped)": rows,
    }, indent=0))


if __name__ == "__main__":
    main()
