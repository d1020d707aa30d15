"""Capture a profiler trace of the hot mapping program and dump HLO op stats.

The ground-truth answer to "where do the 16 ms/iteration go": runs
run_schedule (60-iter staged chunk) under jax.profiler on the live chip,
then parses the xplane with xprof/tensorboard_plugin_profile into per-HLO-op
self-times. Prints the top-N ops as JSON lines.

Run: `python scripts/trace_ops.py [--coarse]`.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coarse", action="store_true")
    ap.add_argument("--out", default="/tmp/niceslam_trace")
    ap.add_argument("--top", type=int, default=30)
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

    from niceslam_tpu.core.rays import Intrinsics
    from niceslam_tpu.grid.hierarchy import GridConfig, init_grids
    from niceslam_tpu.models.decoders import DecoderConfig, init_decoders
    from niceslam_tpu.render.renderer import RenderConfig
    from niceslam_tpu.slam.mapper import (
        FROZEN_DECODERS, MapOptConfig, ProgConfig, build_stage_plan, chunked_schedule,
        init_opt_state, run_schedule,
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
    plan = build_stage_plan(m.iters, 0.4, 0.6, m.stage_lr, coarse=args.coarse)
    chunks, _ = chunked_schedule(plan, mcfg, m.iters)
    opt0 = init_opt_state({"grids": grids, "decoders": params, "cams": cams})

    def run():
        return run_schedule(
            grids, params, cams, masks, bounds, scene_bound, intr, colors,
            depths, valid, fixed, key, chunks[0], opt0, pcfg, rcfg,
        )[4]

    jax.block_until_ready(run())  # compile + warm
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        jax.block_until_ready(run())
        jax.block_until_ready(run())

    paths = sorted(glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                             recursive=True))
    print(f"# xplane files: {paths}", file=sys.stderr)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("hlo_stats", "framework_op_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                paths, tool + "^", {}
            )
        except Exception as e:  # noqa: BLE001
            print(f"# tool {tool} failed: {e}", file=sys.stderr)
            continue
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data)
            except OSError:
                pass
            data = data.decode("utf-8", "replace")
        out = os.path.join(args.out, f"{tool}.json")
        with open(out, "w") as f:
            f.write(data)
        print(f"# wrote {out} ({len(data)} chars)", file=sys.stderr)
        # The payloads are JSON-ish tables; print the head so the caller can
        # inspect the schema without opening the file.
        print(data[:400], file=sys.stderr)
        break


if __name__ == "__main__":
    main()
