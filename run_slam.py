"""CLI entry point: run the TPU-native SLAM engine on a configured dataset.

The reference's main() hard-codes absolute config paths and cannot run at
its current commit (reference: src/main.cpp:5-99; SURVEY.md §2.9.1). This
driver is config-file based with dotted-path overrides:

    python run_slam.py configs/cofusion.yaml
    python run_slam.py configs/replica_room0.yaml --frames 500 \
        --set tracking.iters=20 --set mapping.pixels=2000 \
        --mesh out/mesh.ply --ckpt-dir out/ckpts
"""
from __future__ import annotations

import argparse
import json
import os


def parse_overrides(items):
    out = {}
    for it in items or []:
        k, v = it.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="dataset config yaml (configs/*.yaml)")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--set", action="append", dest="overrides", metavar="K=V")
    ap.add_argument("--log", default=None, help="JSONL metrics path")
    ap.add_argument("--mesh", default=None, help="write final mesh here (.ply)")
    ap.add_argument("--mesh-resolution", type=int, default=128)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--vis-dir", default=None, help="periodic render panels")
    ap.add_argument("--trajectory", default=None, help="save est poses (.npy)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument(
        "--resume", default=None, metavar="CKPT",
        help="resume from an orbax checkpoint directory (failure recovery)",
    )
    ap.add_argument(
        "--profile-dir", default=None,
        help="capture a jax.profiler trace of the whole run to this dir",
    )
    ap.add_argument(
        "--no-precompile", action="store_true",
        help="skip the startup signature warmup (compiles then happen "
        "lazily at first encounter, stalling mid-run)",
    )
    ap.add_argument(
        "--process-id", type=int, default=None,
        help="this host's rank for multi-host runs (parallel.n_processes>1;"
        " see docs/MULTIHOST.md)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from niceslam_tpu.config.schema import load_config
    from niceslam_tpu.slam.system import NiceSLAM

    cfg = load_config(args.config, overrides=parse_overrides(args.overrides))
    # Multi-host bootstrap + ('map','kf') mesh BEFORE any device use
    # (jax.distributed must initialize first) — parallel/runtime.py.
    from niceslam_tpu.parallel.runtime import setup_runtime

    runtime = setup_runtime(cfg, process_id=args.process_id)
    log_path = args.log or os.path.join(cfg.output or "output", "metrics.jsonl")
    slam = NiceSLAM(cfg, log_path=log_path)
    runtime.attach(slam)  # no-op on a 1x1 mesh
    slam.vis_dir = args.vis_dir

    n = args.frames if args.frames is not None else len(slam.reader)
    slam.n_imgs = n
    start = slam.restore(args.resume) if args.resume else 0
    if not args.no_precompile:
        slam.precompile_async()
    ckpt_every = cfg.mapping.ckpt_freq
    from contextlib import nullcontext

    from niceslam_tpu.io.prefetch import Prefetcher
    from niceslam_tpu.utils.profiling import trace

    def dump_mesh(path):
        from niceslam_tpu.eval.mesher import (
            extract_mesh, postprocess_mesh, write_ply,
        )

        mcfg = cfg.meshing
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        verts, faces, colors = extract_mesh(
            slam.state.decoders, slam.state.grids, slam.bounds,
            slam.scene_bound, resolution=args.mesh_resolution,
            level=mcfg.level_set,
        )
        # Upstream meshing.* cleanup (clean_mesh / depth_test /
        # get_largest_components — reference config/nice_slam.yaml:16-25),
        # against the estimated trajectory.
        poses = [np.asarray(p, np.float32) for p in slam.est_c2w]
        verts, faces, colors = postprocess_mesh(
            verts, faces, colors, mcfg,
            poses_c2w=np.asarray(poses) if poses else None,
            intr=slam.intr,
        )
        write_ply(path, verts, faces, colors)
        return len(verts), len(faces)

    # Periodic meshing every mapping.mesh_freq frames (the reference intent:
    # config/nice_slam.yaml:58 declares mesh_freq; nothing reads it there).
    mesh_every = cfg.mapping.mesh_freq
    mesh_stem = os.path.splitext(args.mesh)[0] if args.mesh else None

    pf = Prefetcher(slam.reader, device=jax.devices()[0], start=start, end=n)
    with trace(args.profile_dir) if args.profile_dir else nullcontext():
        for i, frame in enumerate(pf, start=start):
            slam.step(frame)
            if (
                mesh_stem
                and mesh_every > 0
                and i > 0
                and i % mesh_every == 0
            ):
                dump_mesh(f"{mesh_stem}_frame{i:06d}.ply")
            if args.ckpt_dir and i > 0 and i % ckpt_every == 0:
                from niceslam_tpu.utils.checkpoint import save_checkpoint

                slam.flush()  # settle async guards; never persist a faulty map

                save_checkpoint(
                    os.path.join(args.ckpt_dir, f"frame_{i:06d}"),
                    slam.state, slam.est_c2w, slam.gt_c2w, i,
                    bounds=slam.bounds, scene_bound=slam.scene_bound,
                )
        res = slam.result()
    if cfg.verbose:
        print(f"[niceslam] timer: {json.dumps(slam.timer.summary())}")

    if args.trajectory:
        os.makedirs(os.path.dirname(args.trajectory) or ".", exist_ok=True)
        np.save(args.trajectory, np.asarray(res["est_c2w"]))
    if args.mesh:
        nv, nf = dump_mesh(args.mesh)
        print(f"mesh: {nv} verts, {nf} faces -> {args.mesh}")

    ate = res.get("ate_rmse")
    print(
        json.dumps(
            {
                "frames": n,
                "fps_avg": round(slam.log.fps, 3),
                "ate_rmse_cm": None if ate is None else round(ate * 100, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
