"""Per-kernel microbenchmarks on the live accelerator.

Measures the hot ops of the system (SURVEY.md §2.1 native-kernel surface;
BASELINE.md "speed-of-light Pallas" row) in isolation:

- trilinear grid sampling forward and forward+backward (the grid_sample
  replacement, reference src/models/MLP.cpp:51-63),
- the tiny-MLP decoder chain (MLP.cpp:76-102),
- alpha compositing (utils.h:148-172),
- the full render_rays forward and its VJP at mapping batch shapes,
- one full tracking step program and one mapping-stage iteration.

Prints a JSON object per op: {name, n, mean_ms, p50_ms, achieved GB/s or
GFLOP/s where meaningful}. Run on the real chip: `python scripts/kernel_bench.py`.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def timeit(fn, *args, warmup=3, iters=20):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    return float(ts.mean() * 1e3), float(np.percentile(ts, 50) * 1e3)


def report(name, n, mean_ms, p50_ms, extra=None):
    rec = {"op": name, "n": n, "mean_ms": round(mean_ms, 4), "p50_ms": round(p50_ms, 4)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    from niceslam_tpu.core.compositing import raw_to_outputs
    from niceslam_tpu.grid.hierarchy import GridConfig, init_grids
    from niceslam_tpu.models.decoders import (
        DecoderConfig,
        init_decoders,
        nice_forward,
    )
    from niceslam_tpu.ops.trilinear import sample_grid
    from niceslam_tpu.render.renderer import RenderConfig, render_rays

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    bound = np.asarray([[-4.5, 3.82], [-1.5, 2.02], [-3.0, 2.76]], np.float32)
    grids, bounds, bound_adj = init_grids(key, bound, GridConfig())
    params = init_decoders(key, DecoderConfig())
    scene_bound = jnp.asarray(bound_adj)
    for lvl, g in grids.items():
        print(f"# grid {lvl}: {g.shape} = {g.size*4/1e6:.2f} MB", file=sys.stderr)

    # ---- trilinear sampling at mapping scale (1000 rays x 48 samples) ----
    N = 48_000
    pts = jax.random.uniform(
        key, (N, 3), minval=bound[:, 0], maxval=bound[:, 1]
    )

    for lvl in ("middle", "fine", "color"):
        g, b = grids[lvl], bounds[lvl]
        f = jax.jit(lambda g, p: sample_grid(g, p, b))
        m, p50 = timeit(f, g, pts)
        bytes_moved = N * 8 * g.shape[-1] * 4  # 8 corner rows of C floats
        report(f"trilinear_fwd_{lvl}", N, m, p50,
               {"gather_GBps": round(bytes_moved / (p50 * 1e6), 2)})

        vjp = jax.jit(
            lambda g, p: jax.grad(lambda gg: sample_grid(gg, p, b).sum())(g)
        )
        m, p50 = timeit(vjp, g, pts)
        report(f"trilinear_fwdbwd_{lvl}", N, m, p50,
               {"scatter_GBps": round(2 * bytes_moved / (p50 * 1e6), 2)})

    # ---- decoder forward at each stage ----
    for stage in ("middle", "fine", "color"):
        f = jax.jit(
            lambda params, grids, pts: nice_forward(params, grids, pts, bounds, stage)
        )
        m, p50 = timeit(f, params, grids, pts)
        report(f"nice_forward_{stage}", N, m, p50)

    # ---- compositing ----
    n_rays, S = 1000, 48
    raw = jax.random.normal(key, (n_rays, S, 4))
    z = jnp.sort(jax.random.uniform(key, (n_rays, S)), axis=-1)
    rd = jax.random.normal(key, (n_rays, 3))
    f = jax.jit(lambda raw, z, rd: raw_to_outputs(raw, z, rd, occupancy=True))
    m, p50 = timeit(f, raw, z, rd)
    report("compositing", n_rays * S, m, p50)

    # ---- full render: tracking shape (200x48) and mapping shape (1000x48) ----
    rcfg = RenderConfig()
    for n_rays, tag in ((200, "track"), (1000, "map")):
        rd = jax.random.normal(key, (n_rays, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        ro = jnp.zeros((n_rays, 3))
        gtd = jnp.full((n_rays,), 1.5)

        f = jax.jit(
            lambda params, grids, ro, rd, gtd: render_rays(
                params, grids, bounds, scene_bound, ro, rd, gtd, "color", rcfg
            ).depth.sum()
        )
        m, p50 = timeit(f, params, grids, ro, rd, gtd)
        report(f"render_fwd_{tag}", n_rays * 48, m, p50)

        g = jax.jit(
            lambda params, grids, ro, rd, gtd: jax.grad(
                lambda gg: render_rays(
                    params, gg, bounds, scene_bound, ro, rd, gtd, "color", rcfg
                ).depth.sum()
            )(grids)["fine"].sum()
        )
        m, p50 = timeit(g, params, grids, ro, rd, gtd)
        report(f"render_fwdbwd_{tag}", n_rays * 48, m, p50)


if __name__ == "__main__":
    main()
