"""Isolate per-call overhead vs genuine compute of the hot SLAM programs.

perf_breakdown.py showed three anomalies on the tunneled chip:
  - keyframe_overlap_percentages (tiny program): ~1.2 s per call
  - run_schedule: ~18 ms/iteration in-scan vs 5.7 ms isolated loss fwd+bwd
  - coarse pass == staged pass cost despite touching 1/30th the grid bytes

This probe times each program over repeated back-to-back calls (after a warm
call) to split fixed per-call overhead from marginal compute, and bisects the
scan step: loss+grad only vs +Adam vs +mask, stage switch vs fixed stage.

Run on the real chip: `python scripts/dispatch_probe.py`.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_calls(name, fn, n=5):
    import jax

    jax.block_until_ready(fn())  # warm (compile)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    rec = {"probe": name, "ms": [round(t * 1e3, 1) for t in ts]}
    print(json.dumps(rec), flush=True)
    return ts


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
    import optax

    from niceslam_tpu.core.rays import Intrinsics
    from niceslam_tpu.grid.hierarchy import GridConfig, init_grids
    from niceslam_tpu.models.decoders import DecoderConfig, init_decoders
    from niceslam_tpu.render.renderer import RenderConfig
    from niceslam_tpu.slam import keyframes as kf_mod
    from niceslam_tpu.slam.mapper import (
        FROZEN_DECODERS, MapOptConfig, ProgConfig, build_stage_plan, chunked_schedule,
        init_opt_state, mapping_loss, run_schedule,
    )
    from niceslam_tpu.config.schema import MappingConfig

    key = jax.random.PRNGKey(0)
    bound = np.asarray([[-4.5, 3.82], [-1.5, 2.02], [-3.0, 2.76]], np.float32)
    grids, bounds, bound_adj = init_grids(key, bound, GridConfig())
    params = init_decoders(key, DecoderConfig())
    scene_bound = jnp.asarray(bound_adj)
    intr = Intrinsics(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0)
    rcfg = RenderConfig()
    F = 5
    colors = jax.random.uniform(key, (F, intr.H, intr.W, 3))
    depths = jnp.full((F, intr.H, intr.W), 1.5)
    cams = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], jnp.float32), (F, 1))
    valid = jnp.ones((F,), bool)
    fixed = jnp.ones((F,), bool)
    masks = {
        lvl: jnp.ones(g.shape[:3] + (1,), g.dtype) for lvl, g in grids.items()
    }
    m = MappingConfig()
    mcfg = MapOptConfig(frustum_feature_selection=True)
    pcfg = ProgConfig(n_pixels=1000, w_color_loss=0.2, frustum=True,
                      dec_train=FROZEN_DECODERS)

    # ---- 1) overlap selection: fixed overhead or genuine? ----------------
    kf_c2w = jnp.tile(jnp.eye(4, dtype=jnp.float32), (64, 1, 1))
    depth_img = jnp.full((intr.H, intr.W), 1.5)
    color_img = jnp.zeros((intr.H, intr.W, 3))

    bench_calls(
        "overlap_sel",
        lambda: kf_mod.keyframe_overlap_percentages(
            key, intr, jnp.eye(4), depth_img, color_img, kf_c2w
        ),
    )

    # ---- 2) full staged 60-iter schedule (the hot program) ---------------
    plan = build_stage_plan(m.iters, 0.4, 0.6, m.stage_lr)
    chunks, _ = chunked_schedule(plan, mcfg, m.iters)
    opt0 = init_opt_state({"grids": grids, "decoders": params, "cams": cams})

    def staged():
        return run_schedule(
            grids, params, cams, masks, bounds, scene_bound, intr, colors,
            depths, valid, fixed, key, chunks[0], opt0, pcfg, rcfg,
        )[4]

    bench_calls("run_schedule_staged_60", staged)

    # coarse 60-iter schedule (same program, coarse rows)
    plan_c = build_stage_plan(m.iters, 0.4, 0.6, m.stage_lr, coarse=True)
    chunks_c, _ = chunked_schedule(plan_c, mcfg, m.iters)

    def coarse():
        return run_schedule(
            grids, params, cams, masks, bounds, scene_bound, intr, colors,
            depths, valid, fixed, key, chunks_c[0], opt0, pcfg, rcfg,
        )[4]

    bench_calls("run_schedule_coarse_60", coarse)

    # ---- 3) scan-step bisect: K-rep in-program loops ----------------------
    K = 16

    def scanned(body):
        @jax.jit
        def f(grids, cams, key):
            def step(c, i):
                return body(c, jax.random.fold_in(key, i)), None

            out, _ = jax.lax.scan(step, (grids, cams), jnp.arange(K))
            return out

        return f

    lossp = dict(
        bounds=bounds, scene_bound=scene_bound, intr=intr, colors=colors,
        depths=depths, frame_valid=valid, cam_fixed=fixed,
        w_color_loss=0.2, rcfg=rcfg, n_pixels=1000,
    )

    def mk_loss(stage):
        def loss_fn(gr, cams, k):
            return mapping_loss(
                {"grids": gr, "decoders": params, "cams": cams},
                key=k, stage=stage, **lossp,
            )
        return loss_fn

    # (a) loss+grad only, fixed color stage
    def body_grad(c, k):
        gr, cams = c
        g = jax.grad(lambda gg: mk_loss("color")(gg, cams, k))(gr)
        # fold the grad back so the scan carries the same pytree shape
        gr = jax.tree_util.tree_map(lambda p, u: p - 1e-9 * u, gr, g)
        return (gr, cams)

    f = scanned(body_grad)
    jax.block_until_ready(f(grids, cams, key))
    t0 = time.perf_counter()
    jax.block_until_ready(f(grids, cams, key))
    per = (time.perf_counter() - t0) / K * 1e3
    print(json.dumps({"probe": "scan_lossgrad_color", "ms_per_iter": round(per, 2)}), flush=True)

    # (b) + Adam moments over the full grid tree
    adam = optax.scale_by_adam()
    opt_g = adam.init(grids)

    def body_adam(c, k):
        gr, cams = c
        g = jax.grad(lambda gg: mk_loss("color")(gg, cams, k))(gr)
        upd, _ = adam.update(g, opt_g, gr)
        gr = jax.tree_util.tree_map(lambda p, u: p - 1e-3 * u, gr, upd)
        return (gr, cams)

    f = scanned(body_adam)
    jax.block_until_ready(f(grids, cams, key))
    t0 = time.perf_counter()
    jax.block_until_ready(f(grids, cams, key))
    per = (time.perf_counter() - t0) / K * 1e3
    print(json.dumps({"probe": "scan_lossgrad_adam_color", "ms_per_iter": round(per, 2)}), flush=True)

    # (c) coarse-stage loss+grad only (tiny grid)
    def body_coarse(c, k):
        gr, cams = c
        g = jax.grad(lambda gg: mk_loss("coarse")(gg, cams, k))(gr)
        gr = jax.tree_util.tree_map(lambda p, u: p - 1e-9 * u, gr, g)
        return (gr, cams)

    f = scanned(body_coarse)
    jax.block_until_ready(f(grids, cams, key))
    t0 = time.perf_counter()
    jax.block_until_ready(f(grids, cams, key))
    per = (time.perf_counter() - t0) / K * 1e3
    print(json.dumps({"probe": "scan_lossgrad_coarse", "ms_per_iter": round(per, 2)}), flush=True)


if __name__ == "__main__":
    main()
