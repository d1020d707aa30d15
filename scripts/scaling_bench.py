"""Mapping-throughput scaling benchmark over a device mesh.

BASELINE.md north star: >= 70% mapping-throughput scaling efficiency at 2+
hosts. This harness measures the full jitted mapping program
(slam/mapper.optimize_window — render fwd+bwd + Adam, all stages) under
1/2/4/... -device meshes with the ray batch sharded over the mesh
(parallel/mesh.shard_rays) and grid/decoder grads psum-reduced by GSPMD.

Two modes:
- weak scaling (default): pixel budget grows with the mesh (fixed per-chip
  work) — efficiency = t(1) / t(N);
- strong scaling (--strong): fixed total pixel budget — efficiency =
  t(1) / (N * t(N)).

On a CPU host this runs on virtual devices (functional validation of the
sharded program, NOT a hardware bandwidth statement); on a TPU slice the
same script produces the real scaling numbers. Prints one JSON line per
mesh size.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="*", default=None,
                    help="mesh sizes to test (default 1,2,4,..,#devices)")
    ap.add_argument("--pixels", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--strong", action="store_true")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force CPU backend with N virtual devices")
    ap.add_argument("--real-1x1", action="store_true",
                    help="measure the Z-sharded shard_map program on a 1x1 "
                    "mesh against the unsharded program on the SAME device "
                    "(SCALING real_chip_1x1_overhead: the cost of running "
                    "under shard_map at all)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        __import__("os").path.join(
            __import__("os").path.dirname(
                __import__("os").path.dirname(
                    __import__("os").path.abspath(__file__))),
            ".jaxcache-tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    import jax.numpy as jnp

    from niceslam_tpu.config.schema import MappingConfig
    from niceslam_tpu.core.rays import Intrinsics
    from niceslam_tpu.grid.hierarchy import GridConfig, init_grids
    from niceslam_tpu.models.decoders import DecoderConfig, init_decoders
    from niceslam_tpu.parallel.mesh import activate, make_slam_mesh
    from niceslam_tpu.render.renderer import RenderConfig
    from niceslam_tpu.slam.mapper import (
        MapOptConfig, build_stage_plan, optimize_window,
    )

    n_dev = len(jax.devices())
    sizes = args.devices
    if not sizes:
        sizes, s = [], 1
        while s <= n_dev:
            sizes.append(s)
            s *= 2

    key = jax.random.PRNGKey(0)
    bound = np.asarray([[-4.5, 3.82], [-1.5, 2.02], [-3.0, 2.76]], np.float32)
    grids, bounds, bound_adj = init_grids(key, bound, GridConfig())
    params = init_decoders(key, DecoderConfig())
    intr = Intrinsics(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0)
    F = 5
    colors = jax.random.uniform(key, (F, intr.H, intr.W, 3))
    depths = jnp.full((F, intr.H, intr.W), 1.5)
    cams = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], jnp.float32), (F, 1))
    masks = {l: jnp.ones(g.shape[:3] + (1,), g.dtype) for l, g in grids.items()}
    valid = jnp.ones((F,), bool)
    fixed = jnp.ones((F,), bool)
    m = MappingConfig()
    plan = build_stage_plan(args.iters, 0.4, 0.6, m.stage_lr)
    mcfg = MapOptConfig(frustum_feature_selection=False)
    rcfg = RenderConfig()

    if args.real_1x1:
        from niceslam_tpu.parallel.sharded_mapper import (
            make_slam_mesh_2d, make_sharded_run_schedule,
            pad_grid_for_sharding,
        )
        from niceslam_tpu.slam.mapper import (
            ProgConfig, dec_train_from_plan, init_opt_state, run_schedule,
            schedule_arrays,
        )

        for lvl in grids:
            grids[lvl], bounds[lvl] = pad_grid_for_sharding(
                grids[lvl], bounds[lvl], 1
            )
        sched = schedule_arrays(plan, mcfg)
        pcfg = ProgConfig(
            n_pixels=args.pixels, w_color_loss=0.2, frustum=False, ba=False,
            dec_train=dec_train_from_plan(plan, mcfg),
        )
        opt0 = init_opt_state(
            {"grids": grids, "decoders": params, "cams": cams}
        )
        call_args = (
            grids, params, cams, masks, bounds, jnp.asarray(bound_adj),
            intr, colors, depths, valid, fixed, jax.random.PRNGKey(2),
            sched, opt0, pcfg, rcfg,
        )
        rows = {}
        sharded = make_sharded_run_schedule(make_slam_mesh_2d(1, 1))
        # CHAINED timing (PERF_r05.md section 6): per-call block_until_ready
        # under the axon tunnel returned physically impossible times (2 ms
        # for 30 iterations whose render-backward alone is 5.7 ms). Feeding
        # outputs back as inputs for K calls and materializing the final
        # state on host forces truly serialized execution.
        K = 6
        for name, fn in (("unsharded", run_schedule), ("sharded_1x1", sharded)):
            g, d2, c, o = grids, params, cams, opt0
            out = fn(g, d2, c, masks, bounds, jnp.asarray(bound_adj), intr,
                     colors, depths, valid, fixed, jax.random.PRNGKey(0),
                     sched, o, pcfg, rcfg)
            jax.block_until_ready(out)
            g, d2, c, o, _ = out
            t0 = time.perf_counter()
            for i in range(1, K + 1):
                g, d2, c, o, losses = fn(
                    g, d2, c, masks, bounds, jnp.asarray(bound_adj), intr,
                    colors, depths, valid, fixed, jax.random.PRNGKey(i),
                    sched, o, pcfg, rcfg,
                )
            sentinel = float(np.asarray(losses[-1])) + float(
                np.asarray(g["middle"][0, 0, 0, 0])
            )
            rows[name] = (time.perf_counter() - t0) / K
            print(json.dumps({
                "prog": name, "pixels": args.pixels, "iters": args.iters,
                "t_step_s": round(rows[name], 4),
                "sentinel": round(sentinel, 3),
                "platform": jax.devices()[0].platform,
            }), flush=True)
        print(json.dumps({
            "real_chip_1x1_overhead": round(
                rows["sharded_1x1"] / rows["unsharded"] - 1.0, 4
            ),
            "platform": jax.devices()[0].platform,
        }), flush=True)
        return

    t1 = None
    for n in sizes:
        pixels = args.pixels if args.strong else args.pixels * n
        mesh = make_slam_mesh(n)
        call_args = (
            grids, params, cams, masks, bounds, jnp.asarray(bound_adj), intr,
            colors, depths, valid, fixed, jax.random.PRNGKey(2), plan, mcfg,
            rcfg, pixels,
        )
        with activate(mesh):
            jax.block_until_ready(optimize_window(*call_args))  # compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(optimize_window(*call_args))
                ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        if n == sizes[0]:
            t1 = t
        eff = (t1 / t) if not args.strong else (t1 / (n * t))
        print(json.dumps({
            "mesh_devices": n,
            "pixels": pixels,
            "iters": args.iters,
            "t_step_s": round(t, 4),
            "scaling_efficiency": round(eff, 4),
            "mode": "strong" if args.strong else "weak",
            "platform": jax.devices()[0].platform,
        }), flush=True)


if __name__ == "__main__":
    main()
