"""Parity of the Pallas trilerp kernels vs the golden XLA implementations.

Runs in interpreter mode on the CPU test mesh (the real Mosaic compile is
exercised on hardware by scripts/kernel_bench.py --pallas).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from niceslam_tpu.ops.pallas_trilerp import (
    corner_table_pallas,
    gather_rows_pallas,
    trilerp_vmem,
)
from niceslam_tpu.ops.trilinear import (
    corner_table,
    trilerp,
    trilerp_packed,
    voxel_coords,
)


@pytest.fixture
def grid():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(13, 7, 9, 8)).astype(np.float32))


def test_corner_table_parity(grid):
    want = corner_table(grid)
    got = corner_table_pallas(grid, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_corner_table_parity_even_z():
    rng = np.random.default_rng(1)
    grid = jnp.asarray(rng.normal(size=(12, 5, 6, 8)).astype(np.float32))
    want = corner_table(grid)
    got = corner_table_pallas(grid, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_rows_parity(grid):
    table = corner_table(grid)
    rng = np.random.default_rng(2)
    idx = jnp.asarray(rng.integers(0, table.shape[0], 300).astype(np.int32))
    want = jnp.take(table, idx, axis=0)
    got = gather_rows_pallas(table, idx, tn=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_trilerp_vmem_parity(grid):
    rng = np.random.default_rng(3)
    bound = jnp.asarray([[-1.0, 1.0], [-2.0, 1.5], [0.0, 3.0]], jnp.float32)
    pts = jnp.asarray(
        rng.uniform(-1.2, 1.2, size=(500, 3)).astype(np.float32)
        * np.array([1.0, 1.7, 1.5], np.float32)
        + np.array([0.0, -0.2, 1.5], np.float32)
    )
    vz, vy, vx = voxel_coords(pts, bound, grid.shape[:3])
    want = trilerp(grid, vz, vy, vx)
    got = trilerp_vmem(grid, vz, vy, vx, tn=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )
    # and against the packed production path
    packed = trilerp_packed(corner_table(grid), grid.shape[:3], vz, vy, vx)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(packed), rtol=1e-6, atol=1e-6
    )


def test_trilerp_pallas_vjp_parity(grid, monkeypatch):
    """custom_vjp production op == golden autodiff (grid AND coord grads)."""
    monkeypatch.setenv("NICESLAM_PALLAS_INTERPRET", "1")
    from niceslam_tpu.ops.pallas_trilerp import trilerp_pallas

    rng = np.random.default_rng(5)
    nz, ny, nx, c = grid.shape
    n = 257  # deliberately not a tile multiple
    # strictly interior, away from integer coords (grad parity is exact
    # except on the measure-zero lattice/border set where the two border
    # conventions pick different subgradients)
    vz = jnp.asarray((rng.uniform(0.1, nz - 1.1, n) + 0.01).astype(np.float32))
    vy = jnp.asarray((rng.uniform(0.1, ny - 1.1, n) + 0.01).astype(np.float32))
    vx = jnp.asarray((rng.uniform(0.1, nx - 1.1, n) + 0.01).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))

    def golden(gr, a, b, d):
        return jnp.sum(trilerp(gr, a, b, d) * g)

    want_val = golden(grid, vz, vy, vx)
    want_grads = jax.grad(golden, argnums=(0, 1, 2, 3))(grid, vz, vy, vx)

    def ours(gr, a, b, d):
        return jnp.sum(trilerp_pallas(gr, a, b, d) * g)

    got_val = ours(grid, vz, vy, vx)
    got_grads = jax.grad(ours, argnums=(0, 1, 2, 3))(grid, vz, vy, vx)

    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-5)
    for wg, gg in zip(want_grads, got_grads):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(wg), rtol=2e-5, atol=2e-5
        )


def test_scatter_corners_parity(grid):
    """Pallas scatter-add == the autodiff grid-VJP of the golden trilerp."""
    from niceslam_tpu.ops.pallas_trilerp import (
        corner_weights,
        scatter_corners_pallas,
    )

    rng = np.random.default_rng(4)
    nz, ny, nx, c = grid.shape
    n = 300
    vz = jnp.asarray(rng.uniform(0, nz - 1, n).astype(np.float32))
    vy = jnp.asarray(rng.uniform(0, ny - 1, n).astype(np.float32))
    vx = jnp.asarray(rng.uniform(0, nx - 1, n).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))

    _, vjp = jax.vjp(lambda gr: trilerp(gr, vz, vy, vx), grid)
    want = vjp(g)[0].reshape(-1, c)

    z0 = jnp.clip(jnp.floor(vz).astype(jnp.int32), 0, nz - 2)
    y0 = jnp.clip(jnp.floor(vy).astype(jnp.int32), 0, ny - 2)
    x0 = jnp.clip(jnp.floor(vx).astype(jnp.int32), 0, nx - 2)
    w8 = corner_weights(
        vz - z0.astype(vz.dtype), vy - y0.astype(vy.dtype),
        vx - x0.astype(vx.dtype),
    )
    ct8 = w8[:, :, None] * g[:, None, :]
    idx4 = jnp.stack(
        [
            ((z0 + dz) * ny + (y0 + dy)) * nx + x0
            for dz in (0, 1)
            for dy in (0, 1)
        ],
        axis=-1,
    ).astype(jnp.int32)
    got = scatter_corners_pallas(
        idx4, ct8, nz * ny * nx, c, tn=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
