"""Final-frame color-refinement semantics (reference src/Mapper.cpp:507-528).

Upstream splits the refine budget as outer_joint_iters=5 passes of
(iters*5)/5 iterations each, re-running keyframe selection per pass, with
geometry stages skipped (all-color), color decoder fixed, frustum selection
off, and the doubled window. The driver must reproduce exactly that shape.
"""
import dataclasses

import numpy as np

from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
from niceslam_tpu.slam.system import NiceSLAM

from tests.integration.conftest import tiny_config


def test_refine_runs_five_outer_passes_all_color():
    cfg = tiny_config(gt_camera=True)
    cfg = dataclasses.replace(
        cfg,
        mapping=dataclasses.replace(
            cfg.mapping,
            color_refine=True,
            iters=8,
            iters_first=16,
            every_frame=2,
            keyframe_every=1,
        ),
    )
    n = 6
    reader = SyntheticBoxReader(cfg, n_frames=n)
    slam = NiceSLAM(cfg, reader=reader)
    selections = []
    orig = slam._window_slots

    def spy(idx, coarse, salt=0):
        out = orig(idx, coarse, salt=salt)
        selections.append((idx, salt))
        return out

    slam._window_slots = spy
    slam.run(n)

    last = n - 1
    refine_events = [
        r for r in slam.log.records
        if r.get("event") == "map" and r.get("frame") == last
        and not r.get("coarse")
    ]
    # 5 outer passes, each its own mapping pass of `iters` rows. With
    # middle/fine ratios forced to 0 the upstream `<=` boundary still maps
    # iteration 0 to middle (src/Mapper.cpp:351-358 / upstream), so each
    # pass is [middle x1, color x(iters-1)].
    assert len(refine_events) == 5, refine_events
    for ev in refine_events:
        assert ev["stages"][-1] == "color", ev
        assert set(ev["stages"]) <= {"middle", "color"}, ev
        assert ev["stages"].count("middle") <= 1, ev
    # fresh keyframe selection per outer pass (distinct salts at the frame)
    refine_sel = [s for s in selections if s[0] == last]
    assert sorted(salt for _, salt in refine_sel) == [0, 1, 2, 3, 4]
    # the refined map stayed finite
    for lvl, g in slam.state.grids.items():
        assert np.isfinite(np.asarray(g)).all(), lvl
