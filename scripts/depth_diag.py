"""Map-quality diagnostic: where does rendered-depth error live?

Runs the bench scene with GT poses (mapping only), then renders full depth
images at several frames and reports the error distribution (p50/p90/mean)
per frame — separating "the optimization never fits" (init frame bad) from
"the map does not generalize to late frames" (init good, late bad).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--pretrained", default="models/pretrained_decoders.npz")
    ap.add_argument("--eval-frames", type=int, nargs="*", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--iters-first", type=int, default=1500)
    ap.add_argument("--iters", type=int, default=60)
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
        CamConfig,
        GridLenConfig,
        MappingConfig,
        SLAMConfig,
        TrackingConfig,
    )
    from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
    from niceslam_tpu.render.renderer import render_image
    from niceslam_tpu.slam.system import NiceSLAM

    cfg = SLAMConfig(
        dataset="synthetic",
        bound=((-4.5, 3.82), (-1.5, 2.02), (-3.0, 2.76)),
        cam=CamConfig(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0),
        grid_len=GridLenConfig(),
        tracking=TrackingConfig(pixels=200, iters=10, gt_camera=True),
        mapping=MappingConfig(
            pixels=1000,
            iters_first=args.iters_first,
            iters=args.iters,
            every_frame=5,
            keyframe_every=10,
            mapping_window_size=5,
            max_keyframes=64,
            color_refine=False,
        ),
        coarse=True,
        verbose=False,
        sync_method="async",
        pretrained_middle_fine=args.pretrained,
    )
    n = args.frames
    reader = SyntheticBoxReader(cfg, n_frames=n)
    slam = NiceSLAM(cfg, reader=reader, seed=args.seed)
    slam.run(n)
    slam.result()

    evf = args.eval_frames or [0, n // 2, n - 1]
    rows = []
    for k in evf:
        f = reader[k]
        row = {"frame": k}
        for stage in ("middle", "fine", "color"):
            ro = render_image(
                slam.state.decoders, slam.state.grids, slam.bounds,
                slam.scene_bound, slam.intr, jnp.asarray(f.gt_c2w),
                jnp.asarray(f.depth), stage, slam.rcfg,
            )
            d = np.asarray(ro.depth)
            m = f.depth > 0
            serr = (d - f.depth)[m]
            err = np.abs(serr)
            row[stage] = {
                "bias_cm": round(100 * float(serr.mean()), 2),
                "l1_cm": round(100 * float(err.mean()), 2),
                "p50_cm": round(100 * float(np.percentile(err, 50)), 2),
                "p90_cm": round(100 * float(np.percentile(err, 90)), 2),
            }
        rows.append(row)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
