"""Per-kernel microbenchmarks on the live accelerator.

Measures the hot ops of the system (SURVEY.md §2.1 native-kernel surface;
BASELINE.md "speed-of-light Pallas" row) in isolation:

- trilinear grid sampling forward and forward+backward (the grid_sample
  replacement, reference src/models/MLP.cpp:51-63),
- the tiny-MLP decoder chain (MLP.cpp:76-102),
- alpha compositing (utils.h:148-172),
- the full render_rays forward and its grid-VJP at mapping batch shapes.

Dispatch to the accelerator has a large fixed latency on remote/tunneled
setups (~26 ms measured on axon), so each op is repeated K times INSIDE one
compiled program (lax.scan with an input perturbation that defeats CSE) and
the per-iteration time is reported. Prints one JSON object per op.

Run on the real chip: `python scripts/kernel_bench.py`.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_os = __import__("os")
_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, _root)
# Persistent compile cache: each scanned micro-op is its own XLA program and
# tunneled compiles are tens of seconds — cache them across runs.
jax.config.update(
    "jax_compilation_cache_dir", _os.path.join(_root, ".jaxcache-tpu")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

K = 32  # in-program repetitions


def timeit_scanned(fn, *args, iters=8):
    """fn(i, *args) -> scalar; scanned K times inside one jit."""

    @jax.jit
    def repeated(*args):
        def body(c, i):
            return c + fn(i, *args), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return out

    jax.block_until_ready(repeated(*args))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(repeated(*args))
        ts.append((time.perf_counter() - t0) / K)
    return float(np.mean(ts) * 1e3), float(np.percentile(ts, 50) * 1e3)


def try_timeit(name, fn, *args, **kw):
    """timeit_scanned, but a compile/lowering failure becomes a RESULT row
    (candidate kernels legitimately fail on real Mosaic — e.g. unsupported
    gather patterns — and that negative result must be recorded, not abort
    the remaining ops; VERDICT r4 ask #2)."""
    try:
        return timeit_scanned(fn, *args, **kw)
    except Exception as e:  # noqa: BLE001 — record any lowering/runtime error
        msg = str(e).split("\n")[0][:200]
        print(json.dumps({"op": name, "error": msg}), flush=True)
        return None


def report(name, n, mean_ms, p50_ms, extra=None, cost=None, peaks=None):
    """Per-op record; with an analytic ``cost`` dict, adds the roofline:
    sol_ms (speed-of-light time on this chip) and frac_sol (achieved
    fraction of it) — BASELINE.md "speed-of-light, measured" row."""
    rec = {
        "op": name,
        "n": n,
        "mean_ms": round(mean_ms, 4),
        "p50_ms": round(p50_ms, 4),
    }
    if cost is not None and peaks is not None:
        from niceslam_tpu.utils.roofline import sol_ms

        sol = sol_ms(cost["flops"], cost["bytes"], peaks)
        rec["gflops"] = round(cost["flops"] / 1e9, 2)
        rec["mbytes"] = round(cost["bytes"] / 1e6, 2)
        rec["sol_ms"] = round(sol, 4)
        rec["frac_sol"] = round(sol / max(p50_ms, 1e-9), 4)
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
    from niceslam_tpu.utils import roofline

    peaks = roofline.device_peaks()
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    print(
        f"# roofline peaks: {peaks.name} "
        f"{peaks.flops_f32/1e12:.0f} f32-TFLOP/s, {peaks.hbm_gbps:.0f} GB/s",
        file=sys.stderr,
    )
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

        def fwd(i, g, pts, lvl=lvl, b=b):
            return sample_grid(g, pts + i * 1e-6, b).sum()

        m, p50 = timeit_scanned(fwd, g, pts)
        bytes_moved = N * 8 * g.shape[-1] * 4  # 8 corner rows of C floats
        report(f"trilinear_fwd_{lvl}", N, m, p50,
               {"gather_GBps": round(bytes_moved / (p50 * 1e6), 2)},
               cost=roofline.trilinear_cost(N, g.shape[-1], g.size * 4),
               peaks=peaks)

        def fwdbwd(i, g, pts, lvl=lvl, b=b):
            gr = jax.grad(lambda gg: sample_grid(gg, pts + i * 1e-6, b).sum())(g)
            return gr.sum()

        m, p50 = timeit_scanned(fwdbwd, g, pts)
        report(f"trilinear_fwdbwd_{lvl}", N, m, p50,
               {"scatter_GBps": round(2 * bytes_moved / (p50 * 1e6), 2)},
               cost=roofline.trilinear_cost(N, g.shape[-1], g.size * 4,
                                            backward=True),
               peaks=peaks)

    # ---- decoder forward at each stage ----
    for stage in ("middle", "fine", "color"):

        def f(i, params, grids, pts, stage=stage):
            return nice_forward(
                params, grids, pts + i * 1e-6, bounds, stage
            ).sum()

        m, p50 = timeit_scanned(f, params, grids, pts)
        gb = {lvl: g.size * 4 for lvl, g in grids.items()}
        report(f"nice_forward_{stage}", N, m, p50,
               cost=roofline.render_cost(N, 1, 32, gb, stage), peaks=peaks)

    # ---- compositing ----
    n_rays, S = 1000, 48
    raw = jax.random.normal(key, (n_rays, S, 4))
    z = jnp.sort(jax.random.uniform(key, (n_rays, S)), axis=-1)
    rd = jax.random.normal(key, (n_rays, 3))

    def comp(i, raw, z, rd):
        out = raw_to_outputs(raw + i * 1e-6, z, rd, occupancy=True)
        return out.depth.sum() + out.rgb.sum()

    m, p50 = timeit_scanned(comp, raw, z, rd)
    report("compositing", n_rays * S, m, p50,
           cost=roofline.compositing_cost(n_rays, S), peaks=peaks)

    # ---- full render: tracking shape (200x48) and mapping shape (1000x48) ----
    rcfg = RenderConfig()
    for n_rays, tag in ((200, "track"), (1000, "map")):
        rd = jax.random.normal(key, (n_rays, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        ro = jnp.zeros((n_rays, 3))
        gtd = jnp.full((n_rays,), 1.5)

        def rf(i, params, grids, ro, rd, gtd):
            return render_rays(
                params, grids, bounds, scene_bound,
                ro, rd + i * 1e-7, gtd, "color", rcfg,
            ).depth.sum()

        m, p50 = timeit_scanned(rf, params, grids, ro, rd, gtd)
        gb = {lvl: g.size * 4 for lvl, g in grids.items()}
        report(f"render_fwd_{tag}", n_rays * 48, m, p50,
               cost=roofline.render_cost(n_rays, 48, 32, gb), peaks=peaks)

        def rb(i, params, grids, ro, rd, gtd):
            gr = jax.grad(
                lambda gg: render_rays(
                    params, gg, bounds, scene_bound,
                    ro, rd + i * 1e-7, gtd, "color", rcfg,
                ).depth.sum()
            )(grids)
            return sum(x.sum() for x in gr.values())

        m, p50 = timeit_scanned(rb, params, grids, ro, rd, gtd)
        report(f"render_fwdbwd_{tag}", n_rays * 48, m, p50,
               cost=roofline.render_cost(n_rays, 48, 32, gb, backward=True),
               peaks=peaks)

    if "--pallas" in sys.argv:
        pallas_section(grids, bounds, pts, peaks)


def pallas_section(grids, bounds, pts, peaks):
    """Pallas candidates vs their XLA baselines at production shapes
    (VERDICT r3 ask #4). Each op reports its XLA twin alongside."""
    from niceslam_tpu.ops.pallas_trilerp import (
        corner_table_pallas,
        corner_weights,
        gather_rows_pallas,
        scatter_corners_pallas,
        trilerp_vmem,
    )
    from niceslam_tpu.ops.trilinear import corner_table, voxel_coords
    from niceslam_tpu.utils import roofline

    key = jax.random.PRNGKey(7)
    N = pts.shape[0]
    for lvl in ("middle", "fine"):
        g, b = grids[lvl], bounds[lvl]
        nz, ny, nx, c = g.shape
        table_bytes = g.size * 8 * 4

        # corner-table construction: XLA concats vs fused pallas
        def ct_xla(i, g):
            return corner_table(g + i * 1e-6).sum()

        r = try_timeit(f"corner_table_xla_{lvl}", ct_xla, g)
        if r:
            report(f"corner_table_xla_{lvl}", g.size, *r,
                   cost={"flops": 0, "bytes": g.size * 4 + table_bytes},
                   peaks=peaks)

        def ct_pl(i, g):
            return corner_table_pallas(g + i * 1e-6).sum()

        r = try_timeit(f"corner_table_pallas_{lvl}", ct_pl, g)
        if r:
            report(f"corner_table_pallas_{lvl}", g.size, *r,
                   cost={"flops": 0, "bytes": g.size * 4 + table_bytes},
                   peaks=peaks)

        # row gather from the packed table: XLA take vs pallas VMEM gather
        vz, vy, vx = voxel_coords(pts, b, (nz, ny, nx))
        z0 = jnp.clip(jnp.floor(vz).astype(jnp.int32), 0, nz - 2)
        y0 = jnp.clip(jnp.floor(vy).astype(jnp.int32), 0, ny - 2)
        x0 = jnp.clip(jnp.floor(vx).astype(jnp.int32), 0, nx - 2)
        idx = (z0 * ny + y0) * nx + x0
        table = corner_table(g)
        gbytes = N * 8 * c * 4

        def take_xla(i, table, idx):
            return jnp.take(table, idx + (i % 2), axis=0).sum()

        r = try_timeit(f"gather8C_xla_{lvl}", take_xla, table, idx)
        if r:
            report(f"gather8C_xla_{lvl}", N, *r,
                   {"GBps": round(gbytes / (r[1] * 1e6), 2)},
                   cost={"flops": 0, "bytes": gbytes}, peaks=peaks)

        def take_pl(i, table, idx):
            return gather_rows_pallas(table, idx + (i % 2)).sum()

        r = try_timeit(f"gather8C_pallas_{lvl}", take_pl, table, idx)
        if r:
            report(f"gather8C_pallas_{lvl}", N, *r,
                   {"GBps": round(gbytes / (r[1] * 1e6), 2)},
                   cost={"flops": 0, "bytes": gbytes}, peaks=peaks)

        # fused table-free trilerp fwd vs the XLA packed path
        def tri_pl(i, g, vz, vy, vx):
            return trilerp_vmem(g, vz + i * 1e-6, vy, vx).sum()

        r = try_timeit(f"trilerp_fused_pallas_{lvl}", tri_pl, g, vz, vy, vx)
        if r:
            report(f"trilerp_fused_pallas_{lvl}", N, *r,
                   cost=roofline.trilinear_cost(N, c, g.size * 4),
                   peaks=peaks)

        # scatter-add VJP: XLA take-transpose vs pallas pair scatter
        gct = jax.random.normal(key, (N, c))
        w8 = corner_weights(vz - z0, vy - y0, vx - x0)
        ct8 = w8[:, :, None] * gct[:, None, :]
        idx4 = jnp.stack(
            [((z0 + dz) * ny + (y0 + dy)) * nx + x0
             for dz in (0, 1) for dy in (0, 1)], axis=-1,
        ).astype(jnp.int32)
        ct_packed = ct8.reshape(N, 8 * c)

        def sc_xla(i, ct_packed, idx):
            z = jnp.zeros((table.shape[0], 8 * c), ct_packed.dtype)
            return z.at[idx].add(ct_packed + i * 1e-6).sum()

        r = try_timeit(f"scatter_xla_table_{lvl}", sc_xla, ct_packed, idx)
        if r:
            report(f"scatter_xla_table_{lvl}", N, *r,
                   cost={"flops": 0, "bytes": 2 * gbytes}, peaks=peaks)

        def sc_pl(i, ct8, idx4):
            return scatter_corners_pallas(
                idx4, ct8 + i * 1e-6, nz * ny * nx, c
            ).sum()

        r = try_timeit(f"scatter_pallas_{lvl}", sc_pl, ct8, idx4)
        if r:
            report(f"scatter_pallas_{lvl}", N, *r,
                   cost={"flops": 0, "bytes": 2 * gbytes}, peaks=peaks)


if __name__ == "__main__":
    main()
