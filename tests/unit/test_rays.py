import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from niceslam_tpu.core import rays


INTR = rays.Intrinsics(H=48, W=64, fx=80.0, fy=80.0, cx=32.0, cy=24.0)


def project(intr, c2w, pts_world):
    """Reference pinhole projection (OpenGL convention, -z forward)."""
    w2c = np.linalg.inv(c2w)
    p_cam = pts_world @ w2c[:3, :3].T + w2c[:3, 3]
    # camera looks along -z
    i = -p_cam[:, 0] / p_cam[:, 2] * intr.fx + intr.cx
    j = p_cam[:, 1] / p_cam[:, 2] * intr.fy + intr.cy
    return i, j


def test_pinhole_round_trip(rng):
    c2w = np.eye(4)
    c2w[:3, :3] = Rotation.random(random_state=1).as_matrix()
    c2w[:3, 3] = [0.3, -0.2, 0.5]
    ro, rd = rays.rays_for_image(INTR, jnp.asarray(c2w))
    ro, rd = np.asarray(ro), np.asarray(rd)
    # March each ray a random distance, project the point back: must land on
    # its own pixel.
    t = rng.uniform(0.5, 3.0, size=(INTR.H, INTR.W, 1))
    pts = (ro + rd * t).reshape(-1, 3)
    i, j = project(INTR, c2w, pts)
    jj, ii = np.meshgrid(np.arange(INTR.H), np.arange(INTR.W), indexing="ij")
    np.testing.assert_allclose(i.reshape(INTR.H, INTR.W), ii, atol=1e-3)
    np.testing.assert_allclose(j.reshape(INTR.H, INTR.W), jj, atol=1e-3)


def test_ray_dirs_y_axis_not_aliased():
    # Regression guard for reference defect SURVEY.md §2.9.4 (j_t computed
    # from the column index): vertical pixel moves must change ray dir in y.
    c2w = jnp.eye(4)
    _, rd = rays.rays_for_image(INTR, c2w)
    rd = np.asarray(rd)
    assert not np.allclose(rd[0, 10], rd[20, 10])
    assert np.allclose(rd[5, 7, 0], rd[9, 7, 0])  # same column -> same x dir


def test_sample_rays_gathers_matching_supervision(rng):
    depth = jnp.asarray(rng.uniform(0.5, 4.0, size=(INTR.H, INTR.W)).astype(np.float32))
    color = jnp.asarray(rng.uniform(size=(INTR.H, INTR.W, 3)).astype(np.float32))
    c2w = jnp.eye(4)
    batch = rays.sample_rays(
        jax.random.PRNGKey(0), INTR, c2w, depth, color, n=256, edge_h=4, edge_w=6
    )
    assert batch.rays_o.shape == (256, 3)
    assert batch.rays_d.shape == (256, 3)
    # Every sampled ray must be consistent with some in-crop pixel and its
    # own gt: reproject dir -> pixel -> compare gathered depth.
    rd = np.asarray(batch.rays_d)
    i = np.round(-rd[:, 0] / rd[:, 2] * INTR.fx + INTR.cx).astype(int)
    j = np.round(rd[:, 1] / rd[:, 2] * INTR.fy + INTR.cy).astype(int)
    assert (i >= 6).all() and (i < INTR.W - 6).all()
    assert (j >= 4).all() and (j < INTR.H - 4).all()
    np.testing.assert_allclose(
        np.asarray(batch.gt_depth), np.asarray(depth)[j, i], rtol=1e-5
    )


def test_near_far_from_bound():
    bound = jnp.asarray([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])
    ro = jnp.asarray([[0.0, 0.0, 0.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    gt = jnp.asarray([5.0])
    near, far = rays.near_far_from_bound(ro, rd, bound, gt, n_samples=4)
    # Slab exit at z=-1 -> t=1 (+0.01), clamped by 1.2*maxdepth(=6) -> 1.01
    np.testing.assert_allclose(np.asarray(far), [[1.01]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(near), np.full((1, 4), 0.05), atol=1e-6)
