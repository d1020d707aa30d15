"""Checkpoint/resume round-trip (orbax)."""
import numpy as np

from niceslam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_round_trip(gt_mapped_world, tmp_path):
    cfg, reader, slam = gt_mapped_world
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, slam.state, slam.est_c2w, slam.gt_c2w, 5)
    restored = load_checkpoint(path)
    assert restored["frame_idx"] == 5
    np.testing.assert_allclose(
        np.asarray(restored["state"].grids["middle"]),
        np.asarray(slam.state.grids["middle"]),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(restored["state"].keyframes.count),
        np.asarray(slam.state.keyframes.count),
    )
    for a, b in zip(restored["est_c2w"], slam.est_c2w):
        np.testing.assert_allclose(a, b, atol=1e-7)
