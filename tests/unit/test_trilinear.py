import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import map_coordinates

from niceslam_tpu.ops import trilinear

BOUND = np.asarray([[-2.0, 1.0], [-1.0, 2.0], [-3.0, 0.0]], np.float32)


def ref_sample(grid_zyxc, pts, bound):
    """Golden: scipy map_coordinates per channel (order-1 = trilinear,
    mode='nearest' = border clamp), align_corners=True coords."""
    nz, ny, nx, C = grid_zyxc.shape
    n = (pts - bound[:, 0]) / (bound[:, 1] - bound[:, 0]) * 2 - 1
    vx = np.clip((n[:, 0] + 1) / 2 * (nx - 1), 0, nx - 1)
    vy = np.clip((n[:, 1] + 1) / 2 * (ny - 1), 0, ny - 1)
    vz = np.clip((n[:, 2] + 1) / 2 * (nz - 1), 0, nz - 1)
    coords = np.stack([vz, vy, vx])
    return np.stack(
        [
            map_coordinates(grid_zyxc[..., c], coords, order=1, mode="nearest")
            for c in range(C)
        ],
        axis=-1,
    )


def test_matches_scipy_trilinear(rng):
    grid = rng.normal(size=(7, 6, 5, 4)).astype(np.float32)
    pts = rng.uniform(-3.5, 2.5, size=(400, 3)).astype(np.float32)  # incl. OOB
    got = np.asarray(trilinear.sample_grid(jnp.asarray(grid), jnp.asarray(pts), jnp.asarray(BOUND)))
    want = ref_sample(grid, pts, BOUND)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_exact_at_voxel_centers(rng):
    nz, ny, nx, C = 4, 5, 6, 3
    grid = rng.normal(size=(nz, ny, nx, C)).astype(np.float32)
    # World coords of voxel (iz, iy, ix) under align_corners=True:
    iz, iy, ix = 2, 3, 4
    def world(i, dim, axis):
        lo, hi = BOUND[axis]
        return lo + (hi - lo) * i / (dim - 1)
    pt = np.asarray([[world(ix, nx, 0), world(iy, ny, 1), world(iz, nz, 2)]], np.float32)
    got = np.asarray(trilinear.sample_grid(jnp.asarray(grid), jnp.asarray(pt), jnp.asarray(BOUND)))
    np.testing.assert_allclose(got[0], grid[iz, iy, ix], atol=1e-5)


def test_gradient_scatters_to_grid(rng):
    grid = jnp.asarray(rng.normal(size=(4, 4, 4, 2)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1.5, 0.5, size=(32, 3)).astype(np.float32))
    bound = jnp.asarray(BOUND)

    def loss(g):
        return jnp.sum(trilinear.sample_grid(g, pts, bound) ** 2)

    g = jax.grad(loss)(grid)
    assert g.shape == grid.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
    # Numerical check on a few entries.
    eps = 1e-3
    gnp = np.asarray(grid)
    for idx in [(0, 1, 2, 0), (2, 2, 1, 1), (3, 0, 0, 0)]:
        gp = gnp.copy()
        gp[idx] += eps
        gm = gnp.copy()
        gm[idx] -= eps
        num = (loss(jnp.asarray(gp)) - loss(jnp.asarray(gm))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[idx], num, rtol=2e-2, atol=1e-3)


def test_gradient_to_points(rng):
    # Pose optimization backprops through sample positions.
    grid = jnp.asarray(rng.normal(size=(5, 5, 5, 2)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.9, 0.4, size=(16, 3)).astype(np.float32))
    g = jax.grad(lambda p: jnp.sum(trilinear.sample_grid(grid, p, jnp.asarray(BOUND))))(pts)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
