"""Accuracy experiment harness: isolate tracking vs mapping error sources.

Runs the bench workload (synthetic box scene at reference budgets,
BASELINE.md) under controlled variations and reports ATE RMSE, per-frame
pose error, and rendered-depth quality — the tool used to drive bench ATE
from 11.3 cm (round 1) toward the NICE-SLAM-class <= 3 cm target.

    python scripts/accuracy_probe.py --frames 24 --gt-camera      # map-only
    python scripts/accuracy_probe.py --frames 24                  # full SLAM
    python scripts/accuracy_probe.py --frames 24 --decoder-train never
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--gt-camera", action="store_true")
    ap.add_argument("--decoder-train", default="init",
                    choices=["never", "init", "always"],
                    help="mapping.decoder_train policy (never = round-1 "
                    "frozen-random behavior)")
    ap.add_argument("--no-coarse", action="store_true")
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument("--sync", default="async")
    ap.add_argument("--track-iters", type=int, default=10)
    ap.add_argument("--track-pixels", type=int, default=200)
    ap.add_argument("--track-lr", type=float, default=1e-3)
    ap.add_argument("--track-wcolor", type=float, default=0.5)
    ap.add_argument("--no-color-track", action="store_true")
    ap.add_argument("--no-dynamic", action="store_true")
    ap.add_argument("--depth-gate", type=float, default=0.3)
    ap.add_argument("--track-method", default="gn", choices=["gn", "adam"])
    ap.add_argument("--gn-prior-r", type=float, default=0.02)
    ap.add_argument("--gn-prior-t", type=float, default=0.03)
    ap.add_argument("--tv", type=float, default=0.0,
                    help="mapping.tv_weight grid smoothness")
    ap.add_argument("--ba-min", type=int, default=4,
                    help="mapping.BA_min_keyframes gate")
    ap.add_argument("--bootstrap", type=int, default=0,
                    help="mapping.bootstrap_frames")
    ap.add_argument("--separate-lr", action="store_true")
    ap.add_argument("--map-pixels", type=int, default=1000)
    ap.add_argument("--map-iters", type=int, default=60)
    ap.add_argument("--iters-first", type=int, default=1500)
    ap.add_argument("--every-frame", type=int, default=5)
    ap.add_argument("--keyframe-every", type=int, default=10)
    ap.add_argument("--pretrained", default="",
                    help="pretrained decoder npz (cfg.pretrained_middle_fine)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--depth-psnr", action="store_true",
                    help="render final-frame depth and report L1/PSNR")
    args = ap.parse_args()

    # os imported at module top

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jaxcache-tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from niceslam_tpu.config.schema import (
        CamConfig, GridLenConfig, MappingConfig, SLAMConfig, TrackingConfig,
    )
    from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
    from niceslam_tpu.slam.system import NiceSLAM

    cfg = SLAMConfig(
        dataset="synthetic",
        bound=((-4.5, 3.82), (-1.5, 2.02), (-3.0, 2.76)),
        cam=CamConfig(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0),
        grid_len=GridLenConfig(),
        tracking=TrackingConfig(
            pixels=args.track_pixels, iters=args.track_iters,
            lr=args.track_lr, gt_camera=args.gt_camera,
            w_color_loss=args.track_wcolor,
            use_color_in_tracking=not args.no_color_track,
            handle_dynamic=not args.no_dynamic,
            depth_err_gate=args.depth_gate,
            method=args.track_method,
            gn_prior_sigma_r=args.gn_prior_r,
            gn_prior_sigma_t=args.gn_prior_t,
            seperate_LR=args.separate_lr,
        ),
        mapping=MappingConfig(
            pixels=args.map_pixels,
            iters_first=args.iters_first,
            iters=args.map_iters,
            every_frame=args.every_frame,
            keyframe_every=args.keyframe_every,
            mapping_window_size=5,
            max_keyframes=64,
            color_refine=False,
            BA=not args.no_ba,
            BA_min_keyframes=args.ba_min,
            bootstrap_frames=args.bootstrap,
            decoder_train=args.decoder_train,
            tv_weight=args.tv,
        ),
        coarse=not args.no_coarse,
        verbose=False,
        sync_method=args.sync,
        pretrained_middle_fine=args.pretrained,
    )
    n = args.frames
    reader = SyntheticBoxReader(cfg, n_frames=n)
    slam = NiceSLAM(cfg, reader=reader, seed=args.seed)
    slam.precompile_async()

    t0 = time.perf_counter()
    slam.run(n)
    res = slam.result()
    dt = time.perf_counter() - t0

    est = np.asarray(res["est_c2w"])
    gt = np.asarray([g for g in res["gt_c2w"]])
    terr = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
    # Relative pose error: per-frame drift increment (isolates the tracker
    # from accumulated error).
    rel_est = est[1:, :3, 3] - est[:-1, :3, 3]
    rel_gt = gt[1:, :3, 3] - gt[:-1, :3, 3]
    rpe = np.linalg.norm(rel_est - rel_gt, axis=-1)
    out = {
        "frames": n,
        "wall_s": round(dt, 1),
        "ate_rmse_cm": round(100 * res.get("ate_rmse", float("nan")), 3),
        "raw_t_err_cm": {
            "mean": round(100 * float(terr.mean()), 3),
            "max": round(100 * float(terr.max()), 3),
            "last": round(100 * float(terr[-1]), 3),
        },
        "rpe_t_cm": {
            "mean": round(100 * float(rpe.mean()), 3),
            "p90": round(100 * float(np.percentile(rpe, 90)), 3),
        },
        "t_err_curve_cm": [round(100 * float(e), 2) for e in terr],
        "variant": {
            "gt_camera": args.gt_camera,
            "decoder_train": args.decoder_train,
            "pretrained": bool(args.pretrained),
            "seed": args.seed,
            "coarse": not args.no_coarse,
            "BA": not args.no_ba,
            "track": [args.track_pixels, args.track_iters, args.track_lr],
        },
    }

    if args.depth_psnr:
        import jax.numpy as jnp

        from niceslam_tpu.render.renderer import render_image

        f = reader[n - 1]
        ro = render_image(
            slam.state.decoders, slam.state.grids, slam.bounds,
            slam.scene_bound, slam.intr, jnp.asarray(gt[-1]),
            jnp.asarray(f.depth), "color", slam.rcfg,
        )
        d = np.asarray(ro.depth)
        m = f.depth > 0
        l1 = float(np.abs(d - f.depth)[m].mean())
        out["depth_l1_cm"] = round(100 * l1, 3)
        c = np.asarray(ro.rgb)
        mse = float(((c - f.color) ** 2).mean())
        out["color_psnr_db"] = round(-10 * np.log10(mse + 1e-12), 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
