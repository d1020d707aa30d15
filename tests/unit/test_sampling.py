import jax
import jax.numpy as jnp
import numpy as np

from niceslam_tpu.core import sampling
from niceslam_tpu.render.renderer import RenderConfig, render_rays
from tests.unit.test_decoders import make_world


def test_stratified_bounds():
    near = jnp.full((4, 8), 0.1)
    far = jnp.full((4, 1), 2.0)
    z = sampling.stratified_z_vals(near, far, 8)
    assert abs(float(z.min()) - 0.1) < 1e-6 and abs(float(z.max()) - 2.0) < 1e-6
    assert np.all(np.diff(np.asarray(z), axis=-1) > 0)


def test_surface_samples_bracket_depth():
    gt = jnp.asarray([1.0, 2.0, 0.0])
    z = sampling.surface_z_vals(gt, 8)
    z = np.asarray(z)
    np.testing.assert_allclose(z[0, 0], 0.95, atol=1e-6)
    np.testing.assert_allclose(z[0, -1], 1.05, atol=1e-6)
    np.testing.assert_allclose(z[1, 0], 1.9, atol=1e-6)
    # zero-depth row spans [1e-3, max gt]
    np.testing.assert_allclose(z[2, 0], 1e-3, atol=1e-6)
    np.testing.assert_allclose(z[2, -1], 2.0, atol=1e-6)


def test_sample_pdf_concentrates_on_peak(rng):
    # Weight mass in bins ~ [1.0, 1.2] -> samples should land there.
    bins = jnp.broadcast_to(jnp.linspace(0.0, 2.0, 17), (3, 17))
    w = np.full((3, 16), 1e-4, np.float32)
    w[:, 8:10] = 1.0  # bins 8..10 span z in [1.0, 1.25]
    z = sampling.sample_pdf(bins, jnp.asarray(w), 32)
    z = np.asarray(z)
    frac = ((z > 0.95) & (z < 1.3)).mean()
    assert frac > 0.9, frac
    # stochastic variant
    z2 = sampling.sample_pdf(bins, jnp.asarray(w), 32, jax.random.PRNGKey(0))
    assert ((np.asarray(z2) > 0.9) & (np.asarray(z2) < 1.35)).mean() > 0.85


def test_render_with_importance(rng):
    params, grids, bounds, bound = make_world()
    n = 8
    ro = jnp.zeros((n, 3))
    rd = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    gt = jnp.asarray(rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32))
    cfg = RenderConfig(n_samples=8, n_surface=4, n_importance=8)
    out = render_rays(
        params, grids, bounds, jnp.asarray(bound), ro, rd, gt, "color", cfg,
        key=jax.random.PRNGKey(1),
    )
    assert out.weights.shape == (n, 20)
    for x in out:
        assert np.isfinite(np.asarray(x)).all()
