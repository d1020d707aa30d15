"""Steady-state per-section performance breakdown on the live accelerator.

Answers VERDICT r2 "show where the frame budget goes": runs the exact bench
workload (bench.py budgets) in STRICT mode with a blocking timer around every
section — tracker program, keyframe-overlap selection, frustum masks, the
coarse pass, the staged pass — plus the un-attributed remainder (host python
+ dispatch). Each section's wall time includes waiting for its device work
(block_until_ready), so the numbers are true on-chip costs, not dispatch
times. Prints one JSON object (also mirrors the section table to stderr).

Run on the real chip: `python scripts/perf_breakdown.py [--frames 21]`.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=21)
    ap.add_argument("--warm", type=int, default=6)
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
    from niceslam_tpu.io.datasets.base import Frame
    from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
    from niceslam_tpu.slam import system as system_mod
    from niceslam_tpu.slam import keyframes as kf_mod
    from niceslam_tpu.slam.system import NiceSLAM

    cfg = SLAMConfig(
        dataset="synthetic",
        bound=((-4.5, 3.82), (-1.5, 2.02), (-3.0, 2.76)),
        cam=CamConfig(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0),
        grid_len=GridLenConfig(),
        tracking=TrackingConfig(pixels=200, iters=10),
        mapping=MappingConfig(
            pixels=1000, iters_first=1500, iters=60, every_frame=5,
            keyframe_every=10, mapping_window_size=5, max_keyframes=64,
            color_refine=False,
        ),
        coarse=True,
        verbose=False,
        sync_method="strict",  # blocking sections -> attributable time
    )
    n_frames = args.frames
    reader = SyntheticBoxReader(cfg, n_frames=n_frames)
    slam = NiceSLAM(cfg, reader=reader)
    slam.precompile()

    acc = defaultdict(float)
    cnt = defaultdict(int)
    timing = {"on": False}

    def wrap(name, fn, classify=None):
        def wrapped(*a, **kw):
            if not timing["on"]:
                return fn(*a, **kw)
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            out = jax.block_until_ready(out)
            key = name if classify is None else classify(*a, **kw)
            acc[key] += time.perf_counter() - t0
            cnt[key] += 1
            return out

        return wrapped

    # The injection hook for the mapping program; classify coarse vs staged
    # by the first stage id of the traced schedule (0 == coarse).
    base_sched = slam.run_schedule_fn

    def classify_sched(*a, **kw):
        sched = a[12]
        return "map_coarse" if int(np.asarray(sched.stage_ids[0])) == 0 else "map_staged"

    slam.run_schedule_fn = wrap("map", base_sched, classify=classify_sched)
    system_mod.track_frame = wrap("track", system_mod.track_frame)
    kf_mod.keyframe_overlap_percentages = wrap(
        "overlap_sel", kf_mod.keyframe_overlap_percentages
    )
    real_frustum = kf_mod.frustum_masks_for_levels
    kf_mod.frustum_masks_for_levels = wrap("frustum_masks", real_frustum)

    dev = jax.devices()[0]
    frames = []
    for k in range(n_frames):
        f = reader[k]
        frames.append(Frame(
            idx=f.idx,
            color=jax.device_put(f.color, dev),
            depth=jax.device_put(f.depth, dev),
            gt_c2w=f.gt_c2w,
        ))
    jax.block_until_ready(frames[-1].color)

    for i in range(args.warm):
        slam.step(frames[i])
    jax.block_until_ready(slam.state.grids)

    timing["on"] = True
    t0 = time.perf_counter()
    for f in frames[args.warm:]:
        slam.step(f)
    jax.block_until_ready(slam.state.grids)
    total = time.perf_counter() - t0

    n_meas = n_frames - args.warm
    attributed = sum(acc.values())
    sections = {
        k: {
            "total_s": round(v, 4),
            "calls": cnt[k],
            "ms_per_call": round(v / cnt[k] * 1e3, 2),
            "pct": round(100 * v / total, 1),
        }
        for k, v in sorted(acc.items(), key=lambda kv: -kv[1])
    }
    out = {
        "frames": n_meas,
        "total_s": round(total, 3),
        "fps": round(n_meas / total, 3),
        "sections": sections,
        "host_and_dispatch_s": round(total - attributed, 3),
        "host_and_dispatch_pct": round(100 * (total - attributed) / total, 1),
    }
    for k, v in sections.items():
        print(f"# {k:>14}: {v['total_s']:7.3f}s  {v['pct']:5.1f}%  "
              f"({v['calls']}x {v['ms_per_call']:.1f} ms)", file=sys.stderr)
    print(f"# host+dispatch: {out['host_and_dispatch_s']:7.3f}s  "
          f"{out['host_and_dispatch_pct']:5.1f}%", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
