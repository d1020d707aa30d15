import jax
import jax.numpy as jnp
import numpy as np

from niceslam_tpu.render import RenderConfig, render_rays
from tests.unit.test_decoders import make_world


def test_render_shapes_and_finiteness(rng):
    params, grids, bounds, bound = make_world()
    n = 32
    ro = jnp.zeros((n, 3))
    rd = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    gt = jnp.asarray(rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32))
    out = render_rays(
        params, grids, bounds, jnp.asarray(bound), ro, rd, gt, "color"
    )
    assert out.rgb.shape == (n, 3)
    assert out.depth.shape == (n,)
    assert out.weights.shape == (n, 48)
    for x in out:
        assert np.isfinite(np.asarray(x)).all()


def test_zero_depth_rays_handled(rng):
    params, grids, bounds, bound = make_world()
    ro = jnp.zeros((8, 3))
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (8, 1))
    gt = jnp.asarray([0.0, 1.0, 0.0, 2.0, 0.0, 0.5, 1.5, 0.0], jnp.float32)
    out = render_rays(
        params, grids, bounds, jnp.asarray(bound), ro, rd, gt, "middle"
    )
    assert np.isfinite(np.asarray(out.depth)).all()


def test_oob_rays_render_opaque():
    # A ray starting outside the bound pointing away: every sample OOB ->
    # occ forced to 100 -> first sample wins, weights sum to 1.
    params, grids, bounds, bound = make_world()
    ro = jnp.asarray([[10.0, 10.0, 10.0]])
    rd = jnp.asarray([[1.0, 0.0, 0.0]])
    gt = jnp.asarray([1.0])
    out = render_rays(
        params, grids, bounds, jnp.asarray(bound), ro, rd, gt, "middle"
    )
    np.testing.assert_allclose(np.asarray(out.weights).sum(), 1.0, atol=1e-3)


def test_pose_gradients_flow_through_renderer(rng):
    params, grids, bounds, bound = make_world()
    n = 16
    rd = jnp.tile(jnp.asarray([[0.1, 0.0, -1.0]]), (n, 1))
    gt = jnp.full((n,), 1.2)

    def loss(t):
        ro = jnp.tile(t[None, :], (n, 1))
        out = render_rays(
            params, grids, bounds, jnp.asarray(bound), ro, rd, gt, "color"
        )
        return jnp.sum(jnp.abs(out.depth - gt)) + jnp.sum(jnp.abs(out.rgb))

    g = jax.grad(loss)(jnp.asarray([0.0, 0.0, 0.0]))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
