"""Full-mapping-step parity: Z-sharded ('map','kf') vs single-device.

VERDICT r1 item 3: optimize_window/run_schedule must actually run with
Z-sharded grids on a 2-D mesh — these tests assert the sharded program is
numerically the unsharded program (same rays by construction, same updates
to float tolerance).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from niceslam_tpu.config.schema import MappingConfig
from niceslam_tpu.core.rays import Intrinsics
from niceslam_tpu.grid.hierarchy import GridConfig, init_grids
from niceslam_tpu.models.decoders import DecoderConfig, init_decoders
from niceslam_tpu.ops.trilinear import sample_grid
from niceslam_tpu.parallel.sharded_mapper import (
    make_slam_mesh_2d,
    make_sharded_run_schedule,
    pad_grid_for_sharding,
)
from niceslam_tpu.render.renderer import RenderConfig
from niceslam_tpu.slam.mapper import (
    MapOptConfig,
    dec_train_from_plan,
    ProgConfig,
    build_stage_plan,
    init_opt_state,
    run_schedule,
    schedule_arrays,
)


def _world(n_map):
    bound = np.asarray([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]], np.float32)
    key = jax.random.PRNGKey(0)
    kg, kd = jax.random.split(key)
    grids, bounds, bound_adj = init_grids(
        kg,
        bound,
        GridConfig(
            coarse_len=1.0, middle_len=0.5, fine_len=0.25, color_len=0.25,
            bound_divisable=0.25,
        ),
    )
    # Z-pad every level so it divides the map axis (bit-exact border pad).
    for lvl in grids:
        grids[lvl], bounds[lvl] = pad_grid_for_sharding(
            grids[lvl], bounds[lvl], n_map
        )
    params = init_decoders(kd, DecoderConfig())
    return params, grids, bounds, jnp.asarray(bound_adj)


def test_pad_grid_forward_exact():
    """Edge-replicated Z pad + extended bound must not change sample_grid
    (exact in real arithmetic; fp32 rounding of the re-normalized z
    coordinate leaves ~1e-6 noise)."""
    key = jax.random.PRNGKey(3)
    grid = jax.random.normal(key, (7, 6, 5, 8))
    bound = jnp.asarray([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])
    gp, bp = pad_grid_for_sharding(grid, bound, 4)  # 7 -> 8
    assert gp.shape[0] == 8
    # points inside, at, and beyond the z border
    pts = jax.random.uniform(
        jax.random.PRNGKey(4), (512, 3), minval=-1.3, maxval=1.3
    )
    a = sample_grid(grid, pts, bound)
    b = sample_grid(gp, pts, bp)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5
    )


@pytest.mark.parametrize("n_map,n_kf", [(2, 4), (4, 2), (8, 1)])
def test_sharded_run_schedule_matches_unsharded(n_map, n_kf):
    if len(jax.devices()) < n_map * n_kf:
        pytest.skip("needs 8 fake CPU devices")
    params, grids, bounds, scene_bound = _world(n_map)
    intr = Intrinsics(H=24, W=32, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
    F = 3
    key = jax.random.PRNGKey(7)
    colors = jax.random.uniform(key, (F, intr.H, intr.W, 3))
    depths = jnp.full((F, intr.H, intr.W), 1.2)
    cams = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0.3], jnp.float32), (F, 1))
    masks = {
        lvl: (jax.random.uniform(jax.random.PRNGKey(8), g.shape[:3] + (1,)) > 0.2)
        .astype(g.dtype)
        for lvl, g in grids.items()
    }
    valid = jnp.asarray([True, True, False])
    fixed = jnp.asarray([True, False, True])  # BA on the middle frame

    m = MappingConfig()
    plan = build_stage_plan(8, 0.4, 0.6, m.stage_lr)
    mcfg = MapOptConfig(BA=True, train_all_decoders=True, lr_factor=1.0)
    n_pixels = 64  # divisible by every n_kf above
    pcfg = ProgConfig(n_pixels=n_pixels, w_color_loss=0.2, frustum=True,
                  ba=True, dec_train=dec_train_from_plan(plan, mcfg))
    rcfg = RenderConfig(n_samples=8, n_surface=4)
    sched = schedule_arrays(plan, mcfg)
    opt0 = init_opt_state(
        {"grids": grids, "decoders": params, "cams": cams}
    )

    args = (
        grids, params, cams, masks, bounds, scene_bound, intr, colors,
        depths, valid, fixed, jax.random.PRNGKey(11), sched, opt0, pcfg,
        rcfg,
    )
    g_ref, d_ref, c_ref, _, l_ref = run_schedule(*args)

    mesh = make_slam_mesh_2d(n_map, n_kf)
    sharded = make_sharded_run_schedule(mesh)
    g_sh, d_sh, c_sh, _, l_sh = sharded(*args)

    np.testing.assert_allclose(
        np.asarray(l_sh), np.asarray(l_ref), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c_sh), np.asarray(c_ref), rtol=1e-4, atol=5e-5
    )
    for lvl in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_sh[lvl]), np.asarray(g_ref[lvl]),
            rtol=1e-4, atol=5e-5, err_msg=lvl,
        )
    ref_leaves = jax.tree_util.tree_leaves(d_ref)
    sh_leaves = jax.tree_util.tree_leaves(d_sh)
    for a, b in zip(sh_leaves, ref_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5
        )


@pytest.mark.parametrize("n_map,n_kf", [(2, 4), (4, 2)])
def test_sharded_tv_weight_matches_unsharded(n_map, n_kf):
    """mapping.tv_weight > 0 parity (ADVICE r4 medium): the sharded TV term
    (local diffs + ppermute boundary row + stop-gradient psum value) must
    reproduce the unsharded tv expression on the padded grid — loss AND grid
    updates."""
    if len(jax.devices()) < n_map * n_kf:
        pytest.skip("needs 8 fake CPU devices")
    params, grids, bounds, scene_bound = _world(n_map)
    intr = Intrinsics(H=24, W=32, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
    F = 3
    key = jax.random.PRNGKey(7)
    colors = jax.random.uniform(key, (F, intr.H, intr.W, 3))
    depths = jnp.full((F, intr.H, intr.W), 1.2)
    cams = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0.3], jnp.float32), (F, 1))
    masks = {
        lvl: jnp.ones(g.shape[:3] + (1,), g.dtype) for lvl, g in grids.items()
    }
    valid = jnp.asarray([True, True, False])
    fixed = jnp.asarray([True, False, True])

    m = MappingConfig()
    plan = build_stage_plan(6, 0.4, 0.6, m.stage_lr)
    mcfg = MapOptConfig(train_all_decoders=True, tv_weight=0.05)
    pcfg = ProgConfig(
        n_pixels=64, w_color_loss=0.2, frustum=True, ba=False,
        dec_train=dec_train_from_plan(plan, mcfg), tv_weight=0.05,
    )
    rcfg = RenderConfig(n_samples=8, n_surface=4)
    sched = schedule_arrays(plan, mcfg)
    opt0 = init_opt_state({"grids": grids, "decoders": params, "cams": cams})

    args = (
        grids, params, cams, masks, bounds, scene_bound, intr, colors,
        depths, valid, fixed, jax.random.PRNGKey(11), sched, opt0, pcfg,
        rcfg,
    )
    g_ref, _, _, _, l_ref = run_schedule(*args)
    mesh = make_slam_mesh_2d(n_map, n_kf)
    g_sh, _, _, _, l_sh = make_sharded_run_schedule(mesh)(*args)

    # The TV term must actually be live (loss differs from the tv=0 run).
    assert np.all(np.asarray(l_ref) > 0)
    np.testing.assert_allclose(
        np.asarray(l_sh), np.asarray(l_ref), rtol=2e-4, atol=1e-5
    )
    for lvl in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_sh[lvl]), np.asarray(g_ref[lvl]),
            rtol=1e-4, atol=5e-5, err_msg=lvl,
        )
