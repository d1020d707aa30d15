"""Gather-strategy probe for the trilinear kernel (perf experiment, r3).

The round-2 roofline showed the system at 2.4% of HBM speed-of-light with the
trilinear gather/scatter as the measured wall (ops/trilinear.py:19-21:
1.6 ms fwd / 3.7-4.8 ms fwd+bwd per level at 48k points). Hypothesis: TPU
gather cost is dominated by per-index overhead, not bytes — so fewer, larger
contiguous slices win. Variants measured here:

  take8   8 row-gathers of [N] x C          (current production trilerp)
  take2   2 row-gathers of [N] x 4C from a (z,y)-duplicated grid  (4x memory)
  take1   1 row-gather  of [N] x 8C from a (z,y,x)-duplicated grid (8x memory)
  dyn1    1-D dynamic_slice gather of 8C spans from a (z,y)-dup grid (4x mem)
  onehot  one-hot-matmul gather (MXU) — only viable for small grids

Each variant also measures fwd+bwd wrt the grid (the mapping path needs the
scatter-add VJP). Duplicated layouts are *derived* per call from the base
grid (dense shifted-concat, differentiable), so optimization still owns one
canonical grid. Prints one JSON line per (variant, level, direction).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from niceslam_tpu.ops.trilinear import voxel_coords, trilerp  # noqa: E402

K = 32


def timeit_scanned(fn, *args, iters=6):
    @jax.jit
    def repeated(*args):
        def body(c, i):
            return c + fn(i, *args), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return out

    jax.block_until_ready(repeated(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(repeated(*args))
        ts.append((time.perf_counter() - t0) / K)
    return float(np.percentile(ts, 50) * 1e3)


# ---------------------------------------------------------------- variants
def corners_weights(grid_shape3, vz, vy, vx):
    """Clamped base corner + fractional weights, block-start convention:
    start = clip(floor(v), 0, dim-2), w = v - start in [0, 1]."""
    nz, ny, nx = grid_shape3
    z0 = jnp.clip(jnp.floor(vz).astype(jnp.int32), 0, nz - 2)
    y0 = jnp.clip(jnp.floor(vy).astype(jnp.int32), 0, ny - 2)
    x0 = jnp.clip(jnp.floor(vx).astype(jnp.int32), 0, nx - 2)
    wz = vz - z0.astype(vz.dtype)
    wy = vy - y0.astype(vy.dtype)
    wx = vx - x0.astype(vx.dtype)
    return (z0, y0, x0), (wz, wy, wx)


def dup_zy(grid):
    """[Z,Y,X,C] -> [Z,Y,X,4C]: channels = (z,y),(z+1,y),(z,y+1),(z+1,y+1)."""
    gz1 = jnp.concatenate([grid[1:], grid[-1:]], axis=0)
    d = jnp.concatenate([grid, gz1], axis=-1)  # [Z,Y,X,2C] (z, z+1)
    dy1 = jnp.concatenate([d[:, 1:], d[:, -1:]], axis=1)
    return jnp.concatenate([d, dy1], axis=-1)  # [Z,Y,X,4C]


def dup_zyx(grid):
    d = dup_zy(grid)  # [Z,Y,X,4C]
    dx1 = jnp.concatenate([d[:, :, 1:], d[:, :, -1:]], axis=2)
    return jnp.concatenate([d, dx1], axis=-1)  # [Z,Y,X,8C]


def lerp_from_block(blk, wz, wy, wx, C):
    """blk [N, 2(x? see layout), ...] — here blk is [N, 8, C] ordered
    (x-pair outer for take1/dyn1 handled by caller reorder): layout
    [ (z0y0) (z1y0) (z0y1) (z1y1) ] x [x0 x1] -> caller reshapes."""
    # blk: [N, 2x, 4zy, C] with zy order (z0y0, z1y0, z0y1, z1y1)
    cx = blk[:, 0] * (1 - wx)[:, None, None] + blk[:, 1] * wx[:, None, None]
    # cx: [N, 4, C]
    czy = (
        cx[:, 0] * ((1 - wz) * (1 - wy))[:, None]
        + cx[:, 1] * (wz * (1 - wy))[:, None]
        + cx[:, 2] * ((1 - wz) * wy)[:, None]
        + cx[:, 3] * (wz * wy)[:, None]
    )
    return czy


def sample_take8(grid, pts, bound):
    vz, vy, vx = voxel_coords(pts, bound, grid.shape[:3])
    return trilerp(grid, vz, vy, vx)


def sample_take2(grid, pts, bound):
    """2 row-gathers of 4C from the (z,y)-duplicated view."""
    nz, ny, nx, C = grid.shape
    vz, vy, vx = voxel_coords(pts, bound, (nz, ny, nx))
    (z0, y0, x0), (wz, wy, wx) = corners_weights((nz, ny, nx), vz, vy, vx)
    d = dup_zy(grid).reshape(nz * ny * nx, 4 * C)
    flat_idx = (z0 * ny + y0) * nx + x0
    r0 = jnp.take(d, flat_idx, axis=0)  # [N, 4C]
    r1 = jnp.take(d, flat_idx + 1, axis=0)
    blk = jnp.stack([r0, r1], axis=1).reshape(-1, 2, 4, C)
    return lerp_from_block(blk, wz, wy, wx, C)


def sample_take1(grid, pts, bound):
    """1 row-gather of 8C from the (z,y,x)-duplicated view."""
    nz, ny, nx, C = grid.shape
    vz, vy, vx = voxel_coords(pts, bound, (nz, ny, nx))
    (z0, y0, x0), (wz, wy, wx) = corners_weights((nz, ny, nx), vz, vy, vx)
    d = dup_zyx(grid).reshape(nz * ny * nx, 8 * C)
    flat_idx = (z0 * ny + y0) * nx + x0
    r = jnp.take(d, flat_idx, axis=0)  # [N, 8C] = [x0:4C | x1:4C]
    blk = r.reshape(-1, 2, 4, C)
    return lerp_from_block(blk, wz, wy, wx, C)


def sample_dyn1(grid, pts, bound):
    """1-D dynamic-slice gather of an 8C span from the (z,y)-dup flat view."""
    nz, ny, nx, C = grid.shape
    vz, vy, vx = voxel_coords(pts, bound, (nz, ny, nx))
    (z0, y0, x0), (wz, wy, wx) = corners_weights((nz, ny, nx), vz, vy, vx)
    d = dup_zy(grid).reshape(nz * ny * nx * 4 * C)
    start = ((z0 * ny + y0) * nx + x0) * (4 * C)

    def sl(s):
        return jax.lax.dynamic_slice(d, (s,), (8 * C,))

    r = jax.vmap(sl)(start)  # [N, 8C]
    blk = r.reshape(-1, 2, 4, C)
    return lerp_from_block(blk, wz, wy, wx, C)


def sample_onehot(grid, pts, bound):
    """One-hot matmul gather (bf16 MXU) — V x N x C FLOPs."""
    nz, ny, nx, C = grid.shape
    V = nz * ny * nx
    vz, vy, vx = voxel_coords(pts, bound, (nz, ny, nx))
    (z0, y0, x0), (wz, wy, wx) = corners_weights((nz, ny, nx), vz, vy, vx)
    base = (z0 * ny + y0) * nx + x0
    # 8 corners: offsets and weights
    offs = jnp.asarray(
        [0, 1, nx, nx + 1, ny * nx, ny * nx + 1, (ny + 1) * nx, (ny + 1) * nx + 1],
        jnp.int32,
    )
    w8 = jnp.stack(
        [
            (1 - wz) * (1 - wy) * (1 - wx), (1 - wz) * (1 - wy) * wx,
            (1 - wz) * wy * (1 - wx), (1 - wz) * wy * wx,
            wz * (1 - wy) * (1 - wx), wz * (1 - wy) * wx,
            wz * wy * (1 - wx), wz * wy * wx,
        ],
        axis=-1,
    )  # [N, 8]
    idx8 = base[:, None] + offs[None, :]  # [N, 8]
    iota = jnp.arange(V, dtype=jnp.int32)
    W = jnp.sum(
        (idx8[:, :, None] == iota[None, None, :]).astype(jnp.bfloat16)
        * w8[:, :, None].astype(jnp.bfloat16),
        axis=1,
    )  # [N, V]
    return jnp.dot(
        W, grid.reshape(V, C).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def sample_take1_bf16(grid, pts, bound):
    """take1 with the duplicated table cast to bf16 (halves gather bytes);
    lerp stays f32. The master grid remains f32 — only the transient
    sampled copy is low-precision."""
    nz, ny, nx, C = grid.shape
    vz, vy, vx = voxel_coords(pts, bound, (nz, ny, nx))
    (z0, y0, x0), (wz, wy, wx) = corners_weights((nz, ny, nx), vz, vy, vx)
    d = dup_zyx(grid).astype(jnp.bfloat16).reshape(nz * ny * nx, 8 * C)
    flat_idx = (z0 * ny + y0) * nx + x0
    r = jnp.take(d, flat_idx, axis=0).astype(jnp.float32)
    blk = r.reshape(-1, 2, 4, C)
    return lerp_from_block(blk, wz, wy, wx, C)


def main():
    import argparse
    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jaxcache-tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="middle,fine")
    ap.add_argument("--variants", default="take8,take2,take1,dyn1")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    bound = jnp.asarray([[-4.5, 3.82], [-1.5, 2.02], [-3.0, 2.76]], jnp.float32)
    N = 48_000
    pts = jax.random.uniform(
        key, (N, 3), minval=bound[:, 0], maxval=bound[:, 1]
    )
    shapes = {
        "middle": (18, 11, 26, 32),
        "fine": (36, 22, 52, 32),
    }
    shapes = {k: v for k, v in shapes.items() if k in args.levels.split(",")}
    all_variants = {
        "take8": sample_take8,
        "take2": sample_take2,
        "take1": sample_take1,
        "take1_bf16": sample_take1_bf16,
        "dyn1": sample_dyn1,
    }
    variants = {
        k: v for k, v in all_variants.items() if k in args.variants.split(",")
    }
    for lvl, shp in shapes.items():
        g = jax.random.normal(key, shp, jnp.float32) * 0.01
        ref = np.asarray(sample_take8(g, pts, bound))
        vs = dict(variants)
        if lvl == "middle" and "onehot" in args.variants:
            vs["onehot"] = sample_onehot
        for name, fn in vs.items():
            got = np.asarray(fn(g, pts, bound))
            err = float(np.abs(got - ref).max())

            def fwd(i, g, pts, fn=fn):
                return fn(g, pts + i * 1e-6, bound).sum()

            t_f = timeit_scanned(fwd, g, pts)

            def fwdbwd(i, g, pts, fn=fn):
                gr = jax.grad(
                    lambda gg: fn(gg, pts + i * 1e-6, bound).sum()
                )(g)
                return gr.sum()

            t_fb = timeit_scanned(fwdbwd, g, pts)
            print(
                json.dumps(
                    {
                        "level": lvl, "variant": name,
                        "fwd_ms": round(t_f, 4), "fwdbwd_ms": round(t_fb, 4),
                        "max_abs_err_vs_take8": round(err, 8),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
