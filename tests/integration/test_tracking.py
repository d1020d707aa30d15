"""Tracker recovery: a perturbed pose must move toward ground truth.

SURVEY.md §7.2 step 4 validation (upstream-intent semantics: gradients flow,
best-iterate selection, dynamic-pixel masking).
"""
import jax
import jax.numpy as jnp
import numpy as np

from niceslam_tpu.render.renderer import RenderConfig
from niceslam_tpu.slam.tracker import TrackConfig, track_frame


def test_tracking_recovers_translation(gt_mapped_world):
    cfg, reader, slam = gt_mapped_world
    f = reader[2]
    pert = f.gt_c2w.copy()
    pert[:3, 3] += np.array([0.03, 0.0, 0.025], np.float32)
    init_err = np.linalg.norm(pert[:3, 3] - f.gt_c2w[:3, 3])
    # Adam path: the fixture map (trained from random-init decoders) has
    # saturated occupancy transitions whose depth Jacobian is ~0 — the
    # first-order path survives via the uncertainty amplification, while
    # GN is tested on a healthy pretrained-decoder map below.
    tcfg = TrackConfig(
        pixels=200, iters=30, lr=1e-3, ignore_edge_H=4, ignore_edge_W=4,
        method="adam",
    )
    c2w, losses = track_frame(
        slam.state.decoders,
        slam.state.grids,
        slam.bounds,
        slam.scene_bound,
        slam.intr,
        jnp.asarray(f.color),
        jnp.asarray(f.depth),
        jnp.asarray(pert),
        jax.random.PRNGKey(11),
        tcfg,
        slam.rcfg,
    )
    final_err = np.linalg.norm(np.asarray(c2w)[:3, 3] - f.gt_c2w[:3, 3])
    assert np.isfinite(np.asarray(losses)).all()
    # Map resolution bounds achievable accuracy; 40%+ reduction proves the
    # pose gradient is correct and the optimizer descends.
    assert final_err < 0.75 * init_err, (init_err, final_err)


def test_gn_tracking_recovers_translation(pretrained_mapped_world):
    """The production (GN/IRLS) solver on a pretrained-decoder map: a
    warm-start-scale perturbation must be substantially corrected."""
    cfg, reader, slam = pretrained_mapped_world
    f = reader[2]
    pert = f.gt_c2w.copy()
    pert[:3, 3] += np.array([0.015, 0.0, 0.012], np.float32)
    init_err = np.linalg.norm(pert[:3, 3] - f.gt_c2w[:3, 3])
    tcfg = TrackConfig(
        pixels=200, iters=10, ignore_edge_H=4, ignore_edge_W=4,
    )
    c2w, losses = track_frame(
        slam.state.decoders,
        slam.state.grids,
        slam.bounds,
        slam.scene_bound,
        slam.intr,
        jnp.asarray(f.color),
        jnp.asarray(f.depth),
        jnp.asarray(pert),
        jax.random.PRNGKey(11),
        tcfg,
        slam.rcfg,
    )
    final_err = np.linalg.norm(np.asarray(c2w)[:3, 3] - f.gt_c2w[:3, 3])
    assert np.isfinite(np.asarray(losses)).all()
    assert final_err < 0.6 * init_err, (init_err, final_err)


def test_gt_camera_mode_uses_gt(gt_mapped_world):
    cfg, reader, slam = gt_mapped_world
    for est, f_idx in zip(slam.est_c2w, range(5)):
        np.testing.assert_allclose(est, reader[f_idx].gt_c2w, atol=1e-6)
