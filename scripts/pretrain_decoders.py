"""Pretrain the decoder hierarchy across random synthetic scenes.

Upstream NICE-SLAM ships pretrained ConvONet decoders and freezes them at
SLAM time (reference: src/models/NICE.cpp:8-11, config/nice_slam.yaml:13-15,
51 fix_fine) — the decoders are a GENERIC feature->occupancy/color mapping
and the per-scene grids adapt to it. No upstream checkpoints can be fetched
in this environment (zero egress), so this script reproduces the recipe:
jointly optimize SHARED decoders + per-scene grids on K randomized synthetic
scenes (different box geometry/colors/trajectories) with the real mapping
objective, then save the decoders in the native npz pretrain format:

    python scripts/pretrain_decoders.py --scenes 6 --out models/pretrained_decoders.npz

Use from a config:

    pretrained_decoders:
      middle_fine: models/pretrained_decoders.npz

which freezes them at SLAM time (slam/system.py decoder_train -> 'never').
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--iters-first", type=int, default=600)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--decoders-lr", type=float, default=0.002)
    ap.add_argument("--out", default="models/pretrained_decoders.npz")
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

    import numpy as np

    from niceslam_tpu.config.schema import (
        CamConfig, GridLenConfig, MappingConfig, SLAMConfig, TrackingConfig,
    )
    from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
    from niceslam_tpu.models.pretrained import save_decoders_npz
    from niceslam_tpu.slam.system import NiceSLAM

    rng = np.random.default_rng(args.seed)
    decoders = None
    t0 = time.perf_counter()
    # Scenes cycle a FIXED bound set instead of drawing continuous random
    # extents: each distinct bound is a distinct grid shape and therefore a
    # distinct multi-minute XLA compile of the mapping program on the
    # tunneled chip. Three coordinate envelopes (small room / the bench-scale
    # room / large hall) give the Fourier embedding coverage of the raw-xyz
    # ranges SLAM scenes use, while trajectory + look-pattern randomization
    # below varies the geometry the decoders must explain within each.
    BOUND_SET = [
        ((-2.2, 2.2), (-2.2, 2.2), (-2.2, 2.2)),
        ((-4.5, 3.82), (-1.5, 2.02), (-3.0, 2.76)),
        ((-6.0, 5.6), (-2.5, 3.1), (-5.0, 4.6)),
    ]
    for s in range(args.scenes):
        bound = BOUND_SET[s % len(BOUND_SET)]
        cfg = SLAMConfig(
            dataset="synthetic",
            bound=bound,
            cam=CamConfig(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0),
            grid_len=GridLenConfig(),
            tracking=TrackingConfig(gt_camera=True),
            mapping=MappingConfig(
                pixels=1000,
                iters_first=args.iters_first,
                iters=args.iters,
                every_frame=1,
                keyframe_every=2,
                mapping_window_size=5,
                max_keyframes=32,
                color_refine=False,
                BA=False,
                decoder_train="always",
                decoders_lr=args.decoders_lr,
            ),
            coarse=True,
            verbose=False,
            sync_method="strict",
        )
        reader = SyntheticBoxReader(
            cfg, n_frames=args.frames,
            trajectory_kwargs=dict(
                radius=float(rng.uniform(0.2, 0.5)),
                arc_fraction=float(rng.uniform(0.5, 0.9)),
                height_amp=float(rng.uniform(0.05, 0.25)),
            ),
        )
        slam = NiceSLAM(cfg, reader=reader, seed=args.seed + s)
        if decoders is not None:
            # carry the shared decoders across scenes; grids start fresh
            slam.state = slam.state._replace(decoders=decoders)
        slam.run(args.frames)
        decoders = slam.state.decoders
        # guard: a diverged scene must not poison the shared decoders
        finite = all(
            bool(np.isfinite(np.asarray(x)).all())
            for x in jax.tree_util.tree_leaves(decoders)
        )
        print(
            f"scene {s}: bound={np.round(np.asarray(bound), 1).tolist()} "
            f"finite={finite}",
            file=sys.stderr, flush=True,
        )
        assert finite, "decoder pretraining diverged"

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_decoders_npz(args.out, decoders)
    print(json.dumps({
        "scenes": args.scenes,
        "frames_per_scene": args.frames,
        "wall_s": round(time.perf_counter() - t0, 1),
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
