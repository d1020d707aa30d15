"""Multi-seed / multi-variant ATE sweep in ONE process (VERDICT r4 ask #1).

Each `accuracy_probe.py` invocation pays ~1-2 min of axon tunnel init plus
persistent-cache loads; a seed/lever sweep needs dozens of runs, so this
harness runs them all in one process — jit executables persist across
`NiceSLAM` instances (same static signatures), so run 2..N of a variant
costs only its compute (~20-30 s at bench budgets).

    python scripts/accuracy_sweep.py --out SWEEP.jsonl \
        base:seed=0 base:seed=1 base:seed=2 \
        boot:seed=0:bootstrap=5 tv:seed=0:tv=0.01 ...

Each positional arg is `name[:key=val]*`. Keys: seed, frames, bootstrap,
bi (bootstrap_iters), ba_min, balr (BA_cam_lr), tv, fs, fsband, lock,
kf_every, every, window, map_pixels, map_iters, iters_first, method
(gn|adam), prior_r, prior_t, gate, step_clip, doff (gn_depth_offset_sigma),
cs (const_speed), retrack, iters, pixels, use_color, w_color, nsurf, sband,
gt_camera, pretrained (0 disables), pt (decoder artifact suffix),
depth_psnr. One JSON line per run goes to stdout AND --out.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DEFAULTS = dict(
    seed=0, frames=36, bootstrap=0, ba_min=4, tv=0.0, kf_every=10, every=5,
    method="gn", prior_r=0.02, prior_t=0.03, gate=0.3, step_clip=0.02,
    iters=10, pixels=200, gt_camera=0, pretrained=1, depth_psnr=0,
    map_iters=60, iters_first=1500, window=5, use_color=1, map_pixels=1000,
    w_color=0.5, fs=0.0, fsband=0.05, balr=0.001, pt="default", retrack=0, nsurf=16, sband=0.05, cs=1, doff=0.0, lock=0, bi=0,
)


def parse_variant(spec: str) -> dict:
    parts = spec.split(":")
    v = dict(DEFAULTS)
    v["name"] = parts[0]
    for kv in parts[1:]:
        k, val = kv.split("=")
        if k not in DEFAULTS:
            raise KeyError(f"unknown sweep key {k!r}")
        v[k] = type(DEFAULTS[k])(float(val)) if isinstance(
            DEFAULTS[k], (int, float)) else val
    return v


def run_one(v: dict) -> dict:
    import jax
    import numpy as np

    from niceslam_tpu.config.schema import (
        CamConfig, GridLenConfig, MappingConfig, RenderingConfig, SLAMConfig,
        TrackingConfig,
    )
    from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
    from niceslam_tpu.slam.system import NiceSLAM

    _pt_file = (
        "pretrained_decoders.npz" if v["pt"] == "default"
        else f"pretrained_decoders_{v['pt']}.npz"
    )
    pretrained = (
        os.path.join(ROOT, "models", _pt_file) if v["pretrained"] else ""
    )
    cfg = SLAMConfig(
        dataset="synthetic",
        bound=((-4.5, 3.82), (-1.5, 2.02), (-3.0, 2.76)),
        pretrained_middle_fine=pretrained,
        cam=CamConfig(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0),
        grid_len=GridLenConfig(),
        tracking=TrackingConfig(
            pixels=v["pixels"], iters=v["iters"], gt_camera=bool(v["gt_camera"]),
            depth_err_gate=v["gate"], method=v["method"],
            gn_prior_sigma_r=v["prior_r"], gn_prior_sigma_t=v["prior_t"],
            gn_step_clip=v["step_clip"],
            use_color_in_tracking=bool(v["use_color"]),
            const_speed_assumption=bool(v["cs"]),
            gn_depth_offset_sigma=v["doff"],
            w_color_loss=v["w_color"],
        ),
        mapping=MappingConfig(
            pixels=v["map_pixels"], iters_first=v["iters_first"], iters=v["map_iters"],
            every_frame=v["every"], keyframe_every=v["kf_every"],
            mapping_window_size=v["window"], max_keyframes=64,
            color_refine=False, BA_min_keyframes=v["ba_min"], BA_cam_lr=v["balr"],
            bootstrap_frames=v["bootstrap"], bootstrap_iters=v["bi"], tv_weight=v["tv"],
            fs_weight=v["fs"], fs_band=v["fsband"], retrack=bool(v["retrack"]),
            lock_after=v["lock"],
        ),
        coarse=True,
        verbose=False,
        sync_method="async",
        rendering=RenderingConfig(N_surface=v["nsurf"], surface_band=v["sband"]),
    )
    n = v["frames"]
    reader = SyntheticBoxReader(cfg, n_frames=n)
    slam = NiceSLAM(cfg, reader=reader, seed=v["seed"])
    t0 = time.perf_counter()
    slam.run(n)
    res = slam.result()
    import jax as _jax
    _jax.block_until_ready(slam.state.grids)
    dt = time.perf_counter() - t0

    est = np.asarray(res["est_c2w"])
    gt = np.asarray([g for g in res["gt_c2w"]])
    terr = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
    out = {
        "name": v["name"],
        "seed": v["seed"],
        "frames": n,
        "wall_s": round(dt, 1),
        "fps": round(n / dt, 2),
        "ate_rmse_cm": round(100 * res.get("ate_rmse", float("nan")), 3),
        "t_err_cm": {
            "mean": round(100 * float(terr.mean()), 2),
            "max": round(100 * float(terr.max()), 2),
            "last": round(100 * float(terr[-1]), 2),
        },
        "curve_cm": [round(100 * float(e), 1) for e in terr[::3]],
        "variant": {k: v[k] for k in sorted(v) if k != "name"},
    }
    if v["depth_psnr"]:
        import jax.numpy as jnp

        from niceslam_tpu.render.renderer import render_image

        f = reader[n - 1]
        ro = render_image(
            slam.state.decoders, slam.state.grids, slam.bounds,
            slam.scene_bound, slam.intr, jnp.asarray(gt[-1]),
            jnp.asarray(f.depth), "color", slam.rcfg,
        )
        d = np.asarray(ro.depth)
        m = f.depth > 0
        out["depth_l1_cm"] = round(100 * float(np.abs(d - f.depth)[m].mean()), 3)
        c = np.asarray(ro.rgb)
        mse = float(((c - f.color) ** 2).mean())
        out["color_psnr_db"] = round(-10 * np.log10(mse + 1e-12), 2)
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("variants", nargs="+")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(ROOT, ".jaxcache-tpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    sink = open(args.out, "a") if args.out else None
    for spec in args.variants:
        v = parse_variant(spec)
        log(f"--- running {spec}")
        t0 = time.perf_counter()
        try:
            rec = run_one(v)
        except Exception as e:  # noqa: BLE001 — record and continue the sweep
            rec = {"name": v["name"], "seed": v["seed"],
                   "error": str(e).split(chr(10))[0][:300]}
        rec["total_s"] = round(time.perf_counter() - t0, 1)
        line = json.dumps(rec)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()


if __name__ == "__main__":
    main()
