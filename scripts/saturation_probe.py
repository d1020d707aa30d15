"""Measure occupancy-logit saturation of a decoder set on FRESH grids.

At SLAM start the grids are ~zero (N(0, 0.01)); if the frozen decoders'
occ(x, ~0-features) saturates sigmoid(10*occ), grid gradients vanish and the
map can never learn geometry. Healthy: |occ| mostly < ~0.5 with nonzero
d occ / d feature."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from niceslam_tpu.config.schema import (
        CamConfig, GridLenConfig, MappingConfig, SLAMConfig, TrackingConfig,
    )
    from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
    from niceslam_tpu.models.decoders import nice_forward
    from niceslam_tpu.slam.system import NiceSLAM

    path = sys.argv[1] if len(sys.argv) > 1 else "models/pretrained_decoders.npz"
    cfg = SLAMConfig(
        dataset="synthetic",
        bound=((-4.5, 3.82), (-1.5, 2.02), (-3.0, 2.76)),
        cam=CamConfig(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0),
        grid_len=GridLenConfig(),
        tracking=TrackingConfig(gt_camera=True),
        mapping=MappingConfig(pixels=1000),
        coarse=True,
        verbose=False,
        sync_method="strict",
        pretrained_middle_fine=path if path != "none" else "",
    )
    reader = SyntheticBoxReader(cfg, n_frames=1)
    slam = NiceSLAM(cfg, reader=reader, seed=0)

    rng = np.random.default_rng(0)
    b = np.asarray(cfg.bound)
    pts = jnp.asarray(
        rng.uniform(b[:, 0], b[:, 1], size=(4096, 3)), dtype=jnp.float32
    )

    out = {}
    for stage in ("middle", "color"):
        raw = nice_forward(
            slam.state.decoders, slam.state.grids, pts, slam.bounds, stage
        )
        occ = np.asarray(raw[:, 3])
        alpha = 1.0 / (1.0 + np.exp(-np.clip(10.0 * occ, -60, 60)))
        # gradient of ALPHA w.r.t. the middle grid (does any signal flow
        # through the saturating sigmoid?)
        def f(g):
            gr = dict(slam.state.grids)
            gr["middle"] = g
            r = nice_forward(slam.state.decoders, gr, pts, slam.bounds, stage)
            return jnp.sum(jax.nn.sigmoid(10.0 * r[:, 3]))
        gnorm = float(
            jnp.linalg.norm(jax.grad(f)(slam.state.grids["middle"]))
        )
        out[stage] = {
            "occ_mean": round(float(occ.mean()), 3),
            "occ_p10": round(float(np.percentile(occ, 10)), 3),
            "occ_p90": round(float(np.percentile(occ, 90)), 3),
            "alpha_mean": round(float(alpha.mean()), 4),
            "frac_alpha_lt_1e-3": round(float((alpha < 1e-3).mean()), 3),
            "frac_alpha_gt_0.999": round(float((alpha > 0.999).mean()), 3),
            "docc_dmiddlegrid_norm": round(gnorm, 4),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
