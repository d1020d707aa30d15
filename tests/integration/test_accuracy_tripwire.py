"""Accuracy regression tripwire (VERDICT r4 ask #7).

Runs the bench operating point scaled to CI budget — pretrained decoders,
GN tracker, bootstrap mapping, free-space supervision — at 12 frames x 2
seeds on the tiny CPU world and asserts ATE under fixed thresholds, so an
"equivalent-math" perf commit cannot silently multiply the trajectory error
again (the r3->r4 failure mode, twice).

Calibration (measured on this fixture, r5): the shipped configuration lands
ATE ~= 6.4 / 7.0 cm (seeds 0/1); the pre-r5 configuration (no bootstrap, no
free-space loss) lands 5.6 / 13.7 cm — i.e. the per-seed bound below is RED
on the known-bad revision and GREEN with margin on the shipped one.
"""
import dataclasses
import os

import numpy as np

from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
from niceslam_tpu.slam.system import NiceSLAM

from tests.integration.conftest import tiny_config

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _run(seed: int) -> float:
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        pretrained_middle_fine=os.path.join(
            _ROOT, "models", "pretrained_decoders.npz"
        ),
        mapping=dataclasses.replace(
            cfg.mapping, bootstrap_frames=4, fs_weight=1.0
        ),
    )
    reader = SyntheticBoxReader(
        cfg, n_frames=12, trajectory_kwargs=dict(arc_fraction=0.1)
    )
    slam = NiceSLAM(cfg, reader=reader, seed=seed)
    res = slam.run(12)
    return float(res["ate_rmse"]) * 100.0


def test_accuracy_tripwire_two_seeds():
    ates = [_run(seed) for seed in (0, 1)]
    # Per-seed hard bound: red on the pre-r5 configuration (13.7 cm at
    # seed 1), ~40% margin over the shipped configuration's worst seed.
    for seed, ate in zip((0, 1), ates):
        assert ate < 10.0, (seed, ates)
    # Mean bound: catches a uniform degradation both seeds share.
    assert float(np.mean(ates)) < 8.5, ates
