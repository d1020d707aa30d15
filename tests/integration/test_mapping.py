"""Mapper-only convergence: rendered depth/color must fit the observations.

SURVEY.md §7.2 step 3: the minimum end-to-end slice — ingest -> grids ->
decoders -> renderer -> optimizer, no tracking fragility.
"""
import jax.numpy as jnp
import numpy as np

from niceslam_tpu.core.rays import rays_for_image
from niceslam_tpu.render.renderer import render_rays


def test_map_fits_observed_depth_and_color(gt_mapped_world, rng):
    cfg, reader, slam = gt_mapped_world
    f = reader[2]
    ro, rd = rays_for_image(slam.intr, jnp.asarray(f.gt_c2w))
    sel = rng.integers(0, slam.intr.H * slam.intr.W, 400)
    out = render_rays(
        slam.state.decoders,
        slam.state.grids,
        slam.bounds,
        slam.scene_bound,
        ro.reshape(-1, 3)[sel],
        rd.reshape(-1, 3)[sel],
        jnp.asarray(f.depth.reshape(-1)[sel]),
        "color",
        slam.rcfg,
    )
    depth_err = float(jnp.mean(jnp.abs(out.depth - f.depth.reshape(-1)[sel])))
    rgb_err = float(
        jnp.mean(jnp.abs(out.rgb - jnp.asarray(f.color.reshape(-1, 3)[sel])))
    )
    # Coarse grids (0.4 m fine voxels) on a 48x64 sensor: sub-decimeter depth
    # and coarse-color agreement demonstrates optimization actually works
    # (untrained map renders ~meter-scale errors).
    assert depth_err < 0.15, depth_err
    assert rgb_err < 0.12, rgb_err


def test_mapping_losses_decrease(gt_mapped_world):
    # The driver logged per-mapping loss first/last through MetricsLogger;
    # re-run one mapping call and check the curve trends down instead.
    cfg, reader, slam = gt_mapped_world
    # session fixture already optimized; weak sanity: final tracking-free map
    # must beat a fresh random map by a wide margin on depth fit.
    import jax

    from niceslam_tpu.slam.state import init_state

    fresh, _, _ = init_state(
        jax.random.PRNGKey(9),
        np.asarray(cfg.bound, np.float32),
        slam.intr.H,
        slam.intr.W,
    )
    from niceslam_tpu.core.rays import rays_for_image

    f = reader[1]
    ro, rd = rays_for_image(slam.intr, jnp.asarray(f.gt_c2w))
    sel = np.arange(0, slam.intr.H * slam.intr.W, 7)
    gt_d = jnp.asarray(f.depth.reshape(-1)[sel])

    def err(state):
        out = render_rays(
            state.decoders,
            state.grids,
            slam.bounds,
            slam.scene_bound,
            ro.reshape(-1, 3)[sel],
            rd.reshape(-1, 3)[sel],
            gt_d,
            "color",  # the full middle+fine hierarchy (training objective)
            slam.rcfg,
        )
        return float(jnp.mean(jnp.abs(out.depth - gt_d)))

    assert err(slam.state) < 0.5 * err(fresh)
