"""Z-block grid sharding with halo exchange vs. the unsharded sampler.

SURVEY.md §4 "Distributed": halo-exchange grid reads must match unsharded
grid_sample, forward and backward (the scatter-add VJP must accumulate halo
contributions back into their owner block).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from niceslam_tpu.grid.shard import (
    pad_z_to,
    sample_grid_sharded,
    shard_grid,
)
from niceslam_tpu.ops.trilinear import sample_grid
from niceslam_tpu.parallel.mesh import make_map_mesh


@pytest.fixture(scope="module")
def world():
    key = jax.random.PRNGKey(0)
    kg, kp = jax.random.split(key)
    nz, ny, nx, C = 13, 7, 9, 8  # deliberately not divisible by 4
    grid = jax.random.normal(kg, (nz, ny, nx, C))
    bound = jnp.asarray([[-1.0, 1.0], [-0.5, 0.5], [-2.0, 2.0]])
    # include points beyond the bound to exercise border clamping
    pts = jax.random.uniform(kp, (256, 3), minval=-2.5, maxval=2.5)
    return grid, bound, pts


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_forward_matches(world, n_shards):
    grid, bound, pts = world
    ref = sample_grid(grid, pts, bound)
    mesh = make_map_mesh(n_shards)
    gs = shard_grid(grid, mesh)
    out = sample_grid_sharded(gs, pts, bound, mesh, nz_logical=grid.shape[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sharded_backward_matches(world):
    grid, bound, pts = world
    mesh = make_map_mesh(4)
    zp = pad_z_to(grid, 4).shape[0]

    def loss_ref(g):
        return jnp.sum(sample_grid(g, pts, bound) ** 2)

    def loss_sharded(gp):
        return jnp.sum(
            sample_grid_sharded(gp, pts, bound, mesh, nz_logical=grid.shape[0])
            ** 2
        )

    g_ref = jax.grad(loss_ref)(grid)
    g_sh = jax.grad(loss_sharded)(shard_grid(grid, mesh))
    # padding rows must receive exactly zero gradient
    np.testing.assert_allclose(
        np.asarray(g_sh[grid.shape[0]:]), 0.0, atol=0.0
    )
    np.testing.assert_allclose(
        np.asarray(g_sh[: grid.shape[0]]), np.asarray(g_ref), atol=1e-5
    )


def test_sharded_with_ray_axis(world):
    """2-D mesh: grids Z-sharded over 'map', points sharded over 'kf'."""
    grid, bound, pts = world
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("map", "kf"))
    gs = shard_grid(grid, mesh)
    out = sample_grid_sharded(
        gs, pts, bound, mesh, nz_logical=grid.shape[0], ray_axis="kf"
    )
    ref = sample_grid(grid, pts, bound)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
