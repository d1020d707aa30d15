import jax.numpy as jnp
import numpy as np

from niceslam_tpu.core import compositing


def test_single_opaque_surface_density_mode():
    # One huge-density sample at z=2 -> rendered depth == 2, color == sample color.
    S = 8
    z = jnp.linspace(1.0, 3.0, S)[None, :]
    raw = np.zeros((1, S, 4), np.float32)
    k = 4  # z=1 + 4*(2/7) ~ 2.14
    raw[0, k, 3] = 1e6
    raw[0, k, :3] = [0.2, 0.5, 0.9]
    out = compositing.raw_to_outputs(
        jnp.asarray(raw), z, jnp.asarray([[0.0, 0.0, -1.0]]), occupancy=False
    )
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(z)[0, k], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rgb)[0], [0.2, 0.5, 0.9], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth_var)[0], 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.weights).sum(), 1.0, atol=1e-4)


def test_single_opaque_surface_occupancy_mode():
    S = 8
    z = jnp.linspace(1.0, 3.0, S)[None, :]
    raw = np.zeros((1, S, 4), np.float32)
    raw[:, :, 3] = -100.0  # empty space -> sigmoid ~ 0
    raw[0, 5, 3] = 100.0  # occupied
    raw[0, 5, :3] = [1.0, 0.0, 0.0]
    out = compositing.raw_to_outputs(
        jnp.asarray(raw), z, jnp.asarray([[0.0, 0.0, -1.0]]), occupancy=True
    )
    np.testing.assert_allclose(np.asarray(out.depth)[0], np.asarray(z)[0, 5], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rgb)[0], [1.0, 0.0, 0.0], atol=1e-4)


def test_weights_match_manual_cumprod(rng):
    N, S = 4, 16
    occ = rng.normal(size=(N, S)).astype(np.float32)
    rgb = rng.uniform(size=(N, S, 3)).astype(np.float32)
    raw = np.concatenate([rgb, occ[..., None]], axis=-1)
    z = np.sort(rng.uniform(0.1, 4.0, size=(N, S)).astype(np.float32), axis=-1)
    rd = rng.normal(size=(N, 3)).astype(np.float32)
    out = compositing.raw_to_outputs(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), occupancy=True
    )
    alpha = 1.0 / (1.0 + np.exp(-10.0 * occ))
    w_ref = np.zeros_like(alpha)
    for i in range(N):
        T = 1.0
        for s in range(S):
            w_ref[i, s] = alpha[i, s] * T
            T *= 1.0 - alpha[i, s] + 1e-10
    np.testing.assert_allclose(np.asarray(out.weights), w_ref, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.depth), (w_ref * z).sum(-1), atol=1e-4
    )


def test_density_mode_uses_ray_norm_scaled_dists(rng):
    # Doubling ||rays_d|| doubles effective dists -> higher alpha in density
    # mode (utils.h:153 dists * norm(rays_d)).
    S = 8
    z = jnp.linspace(1.0, 3.0, S)[None, :]
    raw = np.zeros((1, S, 4), np.float32)
    raw[0, :, 3] = 0.5
    out1 = compositing.raw_to_outputs(
        jnp.asarray(raw), z, jnp.asarray([[0.0, 0.0, -1.0]]), occupancy=False
    )
    out2 = compositing.raw_to_outputs(
        jnp.asarray(raw), z, jnp.asarray([[0.0, 0.0, -2.0]]), occupancy=False
    )
    assert np.asarray(out2.weights)[0, 0] > np.asarray(out1.weights)[0, 0]
