"""Per-iteration cost of THE mapping program at bench shapes (perf, r3).

Times slam.mapper.run_schedule (the one hot signature: F=5 window, 1000
pixels, 48 samples, staged schedule) and the tracker program on the live
accelerator, reporting ms/iteration — the number that decides end-to-end
fps (per 5-frame group: 5 tracker calls x track.iters + 2 mapping passes x
mapping.iters).

Usage: python scripts/mapper_step_probe.py [--iters 60] [--reps 6]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jaxcache-tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from niceslam_tpu.config.schema import MappingConfig, StageLR
    from niceslam_tpu.core.pose import tensor_from_camera
    from niceslam_tpu.core.rays import Intrinsics
    from niceslam_tpu.grid.hierarchy import GridConfig, init_grids
    from niceslam_tpu.models.decoders import DecoderConfig, init_decoders
    from niceslam_tpu.render.renderer import RenderConfig
    from niceslam_tpu.slam.mapper import (
        MapOptConfig,
    dec_train_from_plan, ProgConfig, Schedule, build_stage_plan,
        init_opt_state, pad_schedule, run_schedule, schedule_arrays,
    )
    from niceslam_tpu.slam.tracker import TrackConfig, track_frame

    key = jax.random.PRNGKey(0)
    bound = np.asarray([[-4.5, 3.82], [-1.5, 2.02], [-3.0, 2.76]], np.float32)
    grids, bounds, bound_adj = init_grids(key, bound, GridConfig())
    decoders = init_decoders(key, DecoderConfig())
    scene_bound = jnp.asarray(bound_adj)
    intr = Intrinsics(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0)
    m = MappingConfig()
    F = 5
    colors = jnp.full((F, 480, 640, 3), 0.5, jnp.float32)
    depths = jnp.full((F, 480, 640), 1.5, jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (F, 1, 1))
    cams = jax.vmap(tensor_from_camera)(poses)
    valid = jnp.ones((F,), bool)
    fixed = jnp.ones((F,), bool)
    masks = {lvl: jnp.ones(g.shape[:3] + (1,), g.dtype) for lvl, g in grids.items()}
    rcfg = RenderConfig()

    mcfg = MapOptConfig(
        pixels=1000, w_color_loss=0.2, lr_factor=1.0,
        train_all_decoders=True, decoders_lr_fallback=m.decoders_lr,
    )
    plan = build_stage_plan(
        args.iters, m.middle_iter_ratio, m.fine_iter_ratio, m.stage_lr
    )
    sched = pad_schedule(
        Schedule(*(x[: args.iters] for x in schedule_arrays(plan, mcfg))),
        args.iters,
    )
    pcfg = ProgConfig(n_pixels=1000, w_color_loss=0.2, frustum=True,
                  dec_train=dec_train_from_plan(plan, mcfg))
    opt_state = init_opt_state(
        {"grids": grids, "decoders": decoders, "cams": cams}
    )

    def call(k):
        out = run_schedule(
            grids, decoders, cams, masks, bounds, scene_bound, intr,
            colors, depths, valid, fixed, k, sched, opt_state, pcfg, rcfg,
        )
        # Force REAL completion with host fetches: block_until_ready on the
        # output pytree has been observed returning before execution
        # finishes on the tunneled (axon) platform — a scalar D2H from each
        # output group is the only trustworthy barrier.
        return float(np.asarray(out[4][-1])) + float(
            np.asarray(out[0]["fine"][0, 0, 0, 0])
        )

    t0 = time.perf_counter()
    call(key)
    compile_s = time.perf_counter() - t0
    ts = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        call(jax.random.fold_in(key, r))
        ts.append(time.perf_counter() - t0)
    per_iter = float(np.percentile(ts, 50)) / args.iters * 1e3
    print(json.dumps({
        "op": "run_schedule", "iters": args.iters,
        "compile_s": round(compile_s, 1),
        "wall_ms": round(float(np.percentile(ts, 50)) * 1e3, 2),
        "ms_per_iter": round(per_iter, 3),
    }), flush=True)

    # tracker program at bench budget
    tcfg = TrackConfig(pixels=200, iters=10)
    color1, depth1 = colors[0], depths[0]
    eye = jnp.eye(4, dtype=jnp.float32)

    def tcall():
        return track_frame(
            decoders, grids, bounds, scene_bound, intr, color1, depth1,
            eye, key, tcfg, rcfg,
        )

    t0 = time.perf_counter()
    jax.block_until_ready(tcall())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        jax.block_until_ready(tcall())
        ts.append(time.perf_counter() - t0)
    wall = float(np.percentile(ts, 50)) * 1e3
    print(json.dumps({
        "op": "track_frame", "iters": tcfg.iters,
        "compile_s": round(compile_s, 1),
        "wall_ms": round(wall, 2),
        "ms_per_iter": round(wall / tcfg.iters, 3),
    }), flush=True)

    # implied steady-state fps at bench budgets (5 tracks + 2 mapping passes
    # per every_frame=5 group)
    group_s = 5 * wall / 1e3 + 2 * float(np.percentile(ts, 50)) * 0  # placeholder
    map_wall_s = per_iter * args.iters / 1e3
    group_s = 5 * wall / 1e3 + 2 * map_wall_s
    print(json.dumps({
        "op": "implied_fps", "value": round(5 / group_s, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
