"""Trilinear feature-grid interpolation (the #1 custom op of the system).

TPU-native replacement for the reference's cuDNN ``grid_sample`` call
(reference: src/models/MLP.cpp:51-63 sample_grid_feature — which, at this
commit, discards the sampled result and returns the raw grid; SURVEY.md
§2.9.6. We implement the intent: sampled features ``[N, C]``).

Semantics match torch ``F.grid_sample(..., mode='bilinear',
padding_mode='border', align_corners=True)`` on a ``[1, C, Z, Y, X]`` volume
with xyz-ordered normalized coords — i.e. world point -> [-1, 1]^3 via the
scene bound (utils.h:132-139 normalize_3d_coordinate), then
``v = (n + 1) / 2 * (dim - 1)``, clamped to the border.

Grid layout here is channel-last ``[Z, Y, X, C]``. The production sampler
(``trilerp_packed``) gathers ONE ``8C``-wide row per point from a
neighbor-duplicated "corner table" (``corner_table``): TPU gather/scatter
cost is dominated by per-index overhead, not bytes (measured: 8 row-gathers
of C floats run at 29 GB/s effective; 1 row-gather of 8C floats at ~3x that
— scripts/gather_probe.py, r3), so packing all 8 corners of a point into one
contiguous row cuts the index count 8x for the same traffic. The table is
rebuilt from the canonical grid per call by dense shifted concats (cheap,
differentiable: its autodiff transpose reduces the 8x-wide scatter back into
the canonical grid with dense shifted adds, and the scatter itself also sees
8x fewer indices — the mapping path's dominant cost in r2). Measured on-chip
(48k points, C=32, middle level): fwd+bwd 3.86 ms (8-row gather) -> 1.62 ms
(packed). The 8-row ``trilerp`` is kept for golden tests and as the halo
building block; the block-gather reformulation (trilerp_block) measured 50x
WORSE and is kept only as a documented negative result.
"""
from __future__ import annotations

import os
from contextlib import contextmanager

import jax
import jax.numpy as jnp


def use_pallas() -> bool:
    """Trace-time switch for the fused Pallas sampler (ops/pallas_trilerp).

    OFF by default — and measured OFF is the decision (KERNEL_r05.json,
    `scripts/kernel_bench.py --pallas` on v5e): real Mosaic cannot lower the
    arbitrary [N]-index row gather the fused sampler needs (lax.gather is
    restricted to take_along_axis-shaped patterns), and the sequential
    pair-scatter VJP kernels crash the Mosaic compiler. XLA's hardware DMA
    gather/scatter (~50 GB/s effective at 48k x 1KB rows) is the production
    path. NICESLAM_PALLAS=1 remains for interpreter-mode parity testing
    (NICESLAM_PALLAS_INTERPRET=1) and for re-evaluation on future
    toolchains; do not enable on current hardware.
    """
    return os.environ.get("NICESLAM_PALLAS", "") not in ("", "0")

# Trace-time sampler override: the Z-sharded mapping program
# (parallel/sharded_mapper.py) swaps in a halo-exchange sampler for the
# duration of its shard_map body trace, so the decoder stack
# (models/decoders.py _feat) needs no distributed-awareness of its own.
_SAMPLER_OVERRIDE = None


@contextmanager
def override_sampler(fn):
    """Install ``fn(grid, pts, bound) -> [N, C]`` as the grid sampler for
    code traced inside this context (trace-time dispatch, not runtime)."""
    global _SAMPLER_OVERRIDE
    prev = _SAMPLER_OVERRIDE
    _SAMPLER_OVERRIDE = fn
    try:
        yield
    finally:
        _SAMPLER_OVERRIDE = prev


def normalize_coords(pts: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """World points ``[..., 3]`` -> normalized [-1, 1]^3 via ``bound [3, 2]``.

    Reference: include/torchlib/utils.h:132-139.
    """
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (pts - lo) / (hi - lo) * 2.0 - 1.0


def voxel_coords(pts: jnp.ndarray, bound: jnp.ndarray, shape3) -> tuple:
    """World points -> clipped float voxel coordinates ``(vz, vy, vx)``.

    align_corners=True mapping: -1 -> 0, +1 -> dim-1, then clamped to the
    border (padding_mode='border').
    """
    nz, ny, nx = shape3
    n = normalize_coords(pts, bound)  # [...,3] in [-1,1], xyz order
    vx = jnp.clip((n[..., 0] + 1.0) * 0.5 * (nx - 1), 0.0, nx - 1)
    vy = jnp.clip((n[..., 1] + 1.0) * 0.5 * (ny - 1), 0.0, ny - 1)
    vz = jnp.clip((n[..., 2] + 1.0) * 0.5 * (nz - 1), 0.0, nz - 1)
    return vz, vy, vx


def trilerp(grid: jnp.ndarray, vz, vy, vx, nz=None) -> jnp.ndarray:
    """Trilinear lerp of ``grid [Z, Y, X, C]`` at float voxel coords.

    ``nz`` bounds the +1 z-neighbor (defaults to the grid's own Z; the
    sharded sampler passes the *logical* Z so halo rows are addressable but
    never over-read).
    """
    gz, ny, nx, C = grid.shape
    nz = gz if nz is None else nz

    x0 = jnp.clip(jnp.floor(vx).astype(jnp.int32), 0, nx - 1)
    y0 = jnp.clip(jnp.floor(vy).astype(jnp.int32), 0, ny - 1)
    z0 = jnp.clip(jnp.floor(vz).astype(jnp.int32), 0, nz - 1)
    x1 = jnp.minimum(x0 + 1, nx - 1)
    y1 = jnp.minimum(y0 + 1, ny - 1)
    z1 = jnp.minimum(z0 + 1, nz - 1)

    wx = (vx - x0.astype(vx.dtype))[..., None]
    wy = (vy - y0.astype(vy.dtype))[..., None]
    wz = (vz - z0.astype(vz.dtype))[..., None]

    flat = grid.reshape(-1, C)

    def corner(z, y, x):
        return jnp.take(flat, (z * ny + y) * nx + x, axis=0)

    c000 = corner(z0, y0, x0)
    c001 = corner(z0, y0, x1)
    c010 = corner(z0, y1, x0)
    c011 = corner(z0, y1, x1)
    c100 = corner(z1, y0, x0)
    c101 = corner(z1, y0, x1)
    c110 = corner(z1, y1, x0)
    c111 = corner(z1, y1, x1)

    c00 = c000 * (1 - wx) + c001 * wx
    c01 = c010 * (1 - wx) + c011 * wx
    c10 = c100 * (1 - wx) + c101 * wx
    c11 = c110 * (1 - wx) + c111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def corner_table(grid: jnp.ndarray) -> jnp.ndarray:
    """Pack every voxel's 8-corner neighborhood into one contiguous row.

    ``[Z, Y, X, C] -> [Z*Y*X, 8C]`` with row ``(z, y, x)`` holding the
    corners ordered ``[x-pair][y-pair][z-pair]``, i.e. reshaped
    ``[2(x), 2(y), 2(z), C]``. Built by edge-replicated shifted concats
    (dense, differentiable); +1 neighbors at the far border replicate the
    border voxel, which is exactly what the weight convention of
    :func:`trilerp_packed` needs there.
    """
    z1 = jnp.concatenate([grid[1:], grid[-1:]], axis=0)
    d = jnp.concatenate([grid, z1], axis=-1)  # [..., 2C]: (z0, z1)
    y1 = jnp.concatenate([d[:, 1:], d[:, -1:]], axis=1)
    d = jnp.concatenate([d, y1], axis=-1)  # [..., 4C]: (y0, y1) x (z0, z1)
    x1 = jnp.concatenate([d[:, :, 1:], d[:, :, -1:]], axis=2)
    d = jnp.concatenate([d, x1], axis=-1)  # [..., 8C]
    return d.reshape(-1, d.shape[-1])


def trilerp_packed(
    table: jnp.ndarray, shape3, vz, vy, vx, nz=None
) -> jnp.ndarray:
    """Trilinear lerp from a :func:`corner_table` at float voxel coords.

    ONE gather of ``[N, 8C]`` rows, then the same nested lerp chain as
    :func:`trilerp` on the unpacked corners — bit-identical results
    (interior indices/weights are equal; at a far border the convention
    start=dim-2/w=1 selects the border corner exactly, as clamp/w=0 does).

    ``shape3`` is the logical ``(Z, Y, X)``; ``nz`` optionally bounds the
    z start below ``Z-2`` differently (the halo sampler passes the logical
    unsharded Z while the table covers its local block + halo row).
    """
    gz, ny, nx = shape3
    nz = gz if nz is None else nz
    C = table.shape[-1] // 8

    z0 = jnp.clip(jnp.floor(vz).astype(jnp.int32), 0, nz - 2)
    y0 = jnp.clip(jnp.floor(vy).astype(jnp.int32), 0, ny - 2)
    x0 = jnp.clip(jnp.floor(vx).astype(jnp.int32), 0, nx - 2)
    wx = (vx - x0.astype(vx.dtype))[..., None]
    wy = (vy - y0.astype(vy.dtype))[..., None]
    wz = (vz - z0.astype(vz.dtype))[..., None]

    rows = jnp.take(table, (z0 * ny + y0) * nx + x0, axis=0)
    if rows.dtype != vx.dtype:
        rows = rows.astype(vx.dtype)
    r = rows.reshape(rows.shape[:-1] + (2, 2, 2, C))  # [.., x, y, z, C]

    c000 = r[..., 0, 0, 0, :]
    c001 = r[..., 1, 0, 0, :]
    c010 = r[..., 0, 1, 0, :]
    c011 = r[..., 1, 1, 0, :]
    c100 = r[..., 0, 0, 1, :]
    c101 = r[..., 1, 0, 1, :]
    c110 = r[..., 0, 1, 1, :]
    c111 = r[..., 1, 1, 1, :]

    c00 = c000 * (1 - wx) + c001 * wx
    c01 = c010 * (1 - wx) + c011 * wx
    c10 = c100 * (1 - wx) + c101 * wx
    c11 = c110 * (1 - wx) + c111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def trilerp_block(grid: jnp.ndarray, vz, vy, vx) -> jnp.ndarray:
    """Trilinear lerp via ONE block-gather of ``[2, 2, 2, C]`` neighborhoods.

    Semantically equal to :func:`trilerp` (one vmapped dynamic_slice -> one
    XLA gather with slice_sizes (2,2,2,C) instead of 8 row-gathers). KEPT AS
    A MEASURED NEGATIVE RESULT, not used: on TPU the multi-dim-slice gather
    lowers ~50x slower than 8 independent row-gathers (87 ms vs 1.6 ms fwd
    at 48k points on v5e-class hardware) — XLA serializes the (2,2,2,C)
    slice walk. Row-gather (:func:`trilerp`) is the production path.

    Border handling: the block start clamps to ``dim-2``; the fractional
    weight is taken against the clamped start so edge voxels still resolve
    exactly (a coordinate at the far border yields weight 1 on the last
    voxel).
    """
    nz, ny, nx, C = grid.shape
    z0 = jnp.clip(jnp.floor(vz).astype(jnp.int32), 0, nz - 2)
    y0 = jnp.clip(jnp.floor(vy).astype(jnp.int32), 0, ny - 2)
    x0 = jnp.clip(jnp.floor(vx).astype(jnp.int32), 0, nx - 2)
    wz = (vz - z0.astype(vz.dtype))[..., None]
    wy = (vy - y0.astype(vy.dtype))[..., None]
    wx = (vx - x0.astype(vx.dtype))[..., None]

    def blk(z, y, x):
        return jax.lax.dynamic_slice(grid, (z, y, x, 0), (2, 2, 2, C))

    b = jax.vmap(blk)(z0.ravel(), y0.ravel(), x0.ravel())
    b = b.reshape(vz.shape + (2, 2, 2, C))  # [..., 2z, 2y, 2x, C]

    cz = b[..., 0, :, :, :] * (1 - wz[..., None, None]) + b[..., 1, :, :, :] * wz[..., None, None]
    cy = cz[..., 0, :, :] * (1 - wy[..., None]) + cz[..., 1, :, :] * wy[..., None]
    return cy[..., 0, :] * (1 - wx) + cy[..., 1, :] * wx


def sample_grid(
    grid: jnp.ndarray, pts: jnp.ndarray, bound: jnp.ndarray
) -> jnp.ndarray:
    """Trilinearly sample ``grid [Z, Y, X, C]`` at world points ``pts [N, 3]``.

    Returns ``[N, C]``. Border padding: out-of-bound points clamp to the edge
    voxel (matching padding_mode='border'); the renderer masks them anyway
    via the occupancy override (src/Renderer.cpp:36).

    Production path: packed corner-table gather (one 8C row per point —
    8x fewer gather/scatter indices than 8 row-gathers; see module
    docstring). Bit-identical to :func:`trilerp`.

    Inside the Z-sharded mapping program (parallel/sharded_mapper.py) an
    installed override routes this through the halo-exchange sampler.
    """
    if _SAMPLER_OVERRIDE is not None:
        return _SAMPLER_OVERRIDE(grid, pts, bound)
    vz, vy, vx = voxel_coords(pts, bound, grid.shape[:3])
    if use_pallas():
        from .pallas_trilerp import trilerp_pallas

        return trilerp_pallas(grid, vz, vy, vx)
    return trilerp_packed(corner_table(grid), grid.shape[:3], vz, vy, vx)
