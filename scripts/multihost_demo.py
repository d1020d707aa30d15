"""Multi-host (multi-process) validation of the sharded mapping step.

Launch one process per host (scripts/run_multihost_cpu.sh runs two local
CPU processes to validate without TPU pods — SURVEY.md §4 "Distributed"):

    python scripts/multihost_demo.py --num-processes 2 --process-id 0 &
    python scripts/multihost_demo.py --num-processes 2 --process-id 1

Each process boots ``jax.distributed.initialize`` (parallel/runtime.py's
bootstrap path), builds one global ('map', 'kf') mesh spanning EVERY
process's devices, and runs the Z-sharded mapping program
(parallel/sharded_mapper.py) for a few steps. Inputs are constructed
on-device inside jit from a shared seed, so no host->remote-device data
plumbing is needed. Process 0 prints a JSON line with the per-step time —
the multi-host datapoint for the scaling story (BASELINE.md >= 70%
efficiency target; on CPU this validates mechanics, not bandwidth).
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
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--coordinator", default="localhost:9876")
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--n-map", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices_per_process)
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import jax.numpy as jnp
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P

    from niceslam_tpu.config.schema import MappingConfig
    from niceslam_tpu.core.rays import Intrinsics
    from niceslam_tpu.grid.hierarchy import GridConfig, init_grids
    from niceslam_tpu.models.decoders import DecoderConfig, init_decoders
    from niceslam_tpu.parallel.sharded_mapper import (
        make_slam_mesh_2d,
        make_sharded_run_schedule,
        pad_grid_for_sharding,
    )
    from niceslam_tpu.render.renderer import RenderConfig
    from niceslam_tpu.slam.mapper import (
        MapOptConfig,
    dec_train_from_plan,
        ProgConfig,
        build_stage_plan,
        init_opt_state,
        schedule_arrays,
    )

    devices = jax.devices()  # GLOBAL device list across processes
    n_total = len(devices)
    n_map = args.n_map
    n_kf = n_total // n_map
    mesh = make_slam_mesh_2d(n_map, n_kf, devices)
    print(
        f"[p{args.process_id}] global devices={n_total} "
        f"mesh=map:{n_map} x kf:{n_kf}",
        file=sys.stderr, flush=True,
    )

    bound = np.asarray([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]], np.float32)
    intr = Intrinsics(H=32, W=32, fx=24.0, fy=24.0, cx=16.0, cy=16.0)
    F = 3
    gcfg = GridConfig(
        coarse_len=1.0, middle_len=0.5, fine_len=0.25, color_len=0.25,
        bound_divisable=0.25,
    )

    # Build every input INSIDE jit with explicit output shardings: all
    # processes trace the same program from the same seed, so the global
    # arrays are consistent without any host->device data shipping.
    g_shard = NamedSharding(mesh, P("map"))
    r_shard = NamedSharding(mesh, P())

    def build():
        key = jax.random.PRNGKey(0)
        kg, kd, kc = jax.random.split(key, 3)
        grids, bounds, bound_adj = init_grids(kg, bound, gcfg)
        for lvl in grids:
            grids[lvl], bounds[lvl] = pad_grid_for_sharding(
                grids[lvl], bounds[lvl], n_map
            )
        params = init_decoders(kd, DecoderConfig())
        colors = jax.random.uniform(kc, (F, intr.H, intr.W, 3))
        depths = jnp.full((F, intr.H, intr.W), 1.2)
        cams = jnp.tile(
            jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], jnp.float32), (F, 1)
        )
        masks = {
            lvl: jnp.ones(g.shape[:3] + (1,), g.dtype)
            for lvl, g in grids.items()
        }
        return (
            grids, bounds, jnp.asarray(bound_adj), params, colors, depths,
            cams, masks,
        )

    shardings = (
        {"coarse": g_shard, "middle": g_shard, "fine": g_shard,
         "color": g_shard},
        {"coarse": r_shard, "middle": r_shard, "fine": r_shard,
         "color": r_shard},
        r_shard,
        jax.tree_util.tree_map(
            lambda _: r_shard, jax.eval_shape(lambda: build()[3])
        ),
        r_shard, r_shard, r_shard,
        {"coarse": g_shard, "middle": g_shard, "fine": g_shard,
         "color": g_shard},
    )
    (grids, bounds, scene_bound, params, colors, depths, cams,
     masks) = jax.jit(build, out_shardings=shardings)()

    m = MappingConfig()
    plan = build_stage_plan(args.iters, 0.4, 0.6, m.stage_lr)
    mcfg = MapOptConfig(train_all_decoders=True)
    n_pixels = 32 * n_total
    pcfg = ProgConfig(n_pixels=n_pixels, w_color_loss=0.2, frustum=True,
                  dec_train=dec_train_from_plan(plan, mcfg))
    rcfg = RenderConfig(n_samples=8, n_surface=4)
    sched = schedule_arrays(plan, mcfg)
    sharded = make_sharded_run_schedule(mesh)
    valid = jnp.ones((F,), bool)
    fixed = jnp.ones((F,), bool)
    opt = init_opt_state({"grids": grids, "decoders": params, "cams": cams})

    losses_last = None
    t0 = None
    for step in range(args.steps):
        grids, params, cams, opt, losses = sharded(
            grids, params, cams, masks, bounds, scene_bound, intr, colors,
            depths, valid, fixed, jax.random.PRNGKey(step), sched, opt,
            pcfg, rcfg,
        )
        jax.block_until_ready(losses)
        if step == 0:
            t0 = time.perf_counter()  # exclude compile
        losses_last = np.asarray(losses)
    dt = (time.perf_counter() - t0) / max(args.steps - 1, 1)

    ok = bool(np.isfinite(losses_last).all())
    if args.process_id == 0:
        print(json.dumps({
            "multihost": True,
            "processes": args.num_processes,
            "global_devices": n_total,
            "mesh": {"map": n_map, "kf": n_kf},
            "finite": ok,
            "loss_first": float(losses_last[0]),
            "loss_last": float(losses_last[-1]),
            "s_per_mapping_step": round(dt, 4),
        }))
    assert ok, "non-finite losses in multihost run"


if __name__ == "__main__":
    main()
