import jax
import jax.numpy as jnp
import numpy as np

from niceslam_tpu.grid import GridConfig, init_grids
from niceslam_tpu.models import DecoderConfig, init_decoders, nice_forward

BOUND = np.asarray([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]], np.float32)


def make_world(seed=0):
    key = jax.random.PRNGKey(seed)
    kg, kd = jax.random.split(key)
    grids, bounds, bound = init_grids(kg, BOUND, GridConfig())
    params = init_decoders(kd, DecoderConfig())
    return params, grids, bounds, bound


def test_grid_shapes():
    _, grids, bounds, bound = make_world()
    # extent 4m (snapped to 4.16 by bound_divisable=0.32): middle 4.16/0.32=13
    assert grids["middle"].shape == (13, 13, 13, 32)
    assert grids["fine"].shape == (26, 26, 26, 32)
    assert grids["color"].shape == (26, 26, 26, 32)
    # coarse: extent*2 / 2.0 = 4.16
    assert grids["coarse"].shape == (4, 4, 4, 32)
    np.testing.assert_allclose(
        np.asarray(bounds["coarse"]), np.asarray(bounds["middle"]) * 2.0
    )


def test_stage_outputs(rng):
    params, grids, bounds, _ = make_world()
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(64, 3)).astype(np.float32))
    for stage in ("coarse", "middle", "fine", "color"):
        raw = nice_forward(params, grids, pts, bounds, stage)
        assert raw.shape == (64, 4)
        assert np.isfinite(np.asarray(raw)).all()
        if stage != "color":
            np.testing.assert_allclose(np.asarray(raw[:, :3]), 0.0)


def test_fine_stage_is_residual_on_middle(rng):
    params, grids, bounds, _ = make_world()
    pts = jnp.asarray(rng.uniform(-1.0, 1.0, size=(16, 3)).astype(np.float32))
    mid = np.asarray(nice_forward(params, grids, pts, bounds, "middle"))[:, 3]
    fine = np.asarray(nice_forward(params, grids, pts, bounds, "fine"))[:, 3]
    col = np.asarray(nice_forward(params, grids, pts, bounds, "color"))[:, 3]
    # color occupancy equals fine-stage occupancy (middle + fine residual)
    np.testing.assert_allclose(col, fine, atol=1e-5)
    assert not np.allclose(fine, mid)


def test_gradients_flow_to_proper_grids(rng):
    params, grids, bounds, _ = make_world()
    pts = jnp.asarray(rng.uniform(-1.0, 1.0, size=(32, 3)).astype(np.float32))

    def loss(grids, stage):
        return jnp.sum(nice_forward(params, grids, pts, bounds, stage)[:, 3] ** 2)

    g_mid = jax.grad(loss)(grids, "middle")
    assert np.abs(np.asarray(g_mid["middle"])).sum() > 0
    assert np.abs(np.asarray(g_mid["fine"])).sum() == 0
    assert np.abs(np.asarray(g_mid["coarse"])).sum() == 0

    g_fine = jax.grad(loss)(grids, "fine")
    assert np.abs(np.asarray(g_fine["fine"])).sum() > 0
    # middle grid still gets grads through the middle-occ term of the fine
    # stage (only the concat_feature read is stop-gradient).
    assert np.abs(np.asarray(g_fine["middle"])).sum() > 0


def test_fourier_embedding_B_is_frozen(rng):
    params, grids, bounds, _ = make_world()
    pts = jnp.asarray(rng.uniform(-1.0, 1.0, size=(8, 3)).astype(np.float32))

    def loss(params):
        return jnp.sum(nice_forward(params, grids, pts, bounds, "middle") ** 2)

    g = jax.grad(loss)(params)
    assert np.abs(np.asarray(g["middle"]["embed_B"])).sum() == 0
    assert np.abs(np.asarray(g["middle"]["linears"][0]["w"])).sum() > 0
