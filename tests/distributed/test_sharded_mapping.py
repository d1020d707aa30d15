"""Multi-chip mapping on the fake 8-device CPU mesh.

SURVEY.md §4 "Distributed": the sharded mapping step must match the
single-device step numerically (psum vs local sum), and the dry-run entry
must compile+execute the full training step over the mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from niceslam_tpu.config.schema import MappingConfig
from niceslam_tpu.core.rays import Intrinsics
from niceslam_tpu.parallel.mesh import activate, make_slam_mesh
from niceslam_tpu.render.renderer import RenderConfig
from niceslam_tpu.slam.mapper import MapOptConfig, build_stage_plan, optimize_window


def _setup():
    params, grids, bounds, bound_adj = graft._tiny_world()
    intr = Intrinsics(H=32, W=32, fx=24.0, fy=24.0, cx=16.0, cy=16.0)
    F = 2
    key = jax.random.PRNGKey(0)
    colors = jax.random.uniform(key, (F, intr.H, intr.W, 3))
    depths = jnp.full((F, intr.H, intr.W), 1.0)
    cams = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], jnp.float32), (F, 1))
    masks = {l: jnp.ones(g.shape[:3] + (1,), g.dtype) for l, g in grids.items()}
    valid = jnp.ones((F,), bool)
    fixed = jnp.ones((F,), bool)
    m = MappingConfig()
    plan = build_stage_plan(4, 0.5, 0.75, m.stage_lr)
    mcfg = MapOptConfig(frustum_feature_selection=False)
    rcfg = RenderConfig(n_samples=8, n_surface=4)
    args = (
        grids, params, cams, masks, bounds, jnp.asarray(bound_adj), intr,
        colors, depths, valid, fixed, jax.random.PRNGKey(2), plan, mcfg,
        rcfg, 32,
    )
    return args


def test_sharded_matches_unsharded():
    args = _setup()
    g0, d0, c0, l0 = optimize_window(*args)
    mesh = make_slam_mesh(8)
    with activate(mesh):
        g1, d1, c1, l1 = optimize_window(*args)
    np.testing.assert_allclose(
        np.asarray(l0), np.asarray(l1), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(g0["middle"]), np.asarray(g1["middle"]), atol=2e-5
    )


def test_dryrun_multichip_entry():
    graft.dryrun_multichip(8)
