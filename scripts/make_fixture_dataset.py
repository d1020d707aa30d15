"""Materialize the synthetic scene on disk in a real dataset layout.

No network egress exists in the build environment, so the reference's
dataset fetch (reference: scripts/download_cofusion.sh:1-4 -> Co-Fusion
room4) cannot run here. This script produces a byte-level-real stand-in:
analytic RGB-D frames written in the EXACT on-disk layout of each dataset
family, so the real readers (PNG/JPG/EXR decode, trajectory parsing,
depth-scale handling, pose-convention conversion) run end-to-end against
real files through the real CLI:

    python scripts/make_fixture_dataset.py --layout cofusion \
        --out data/cofusion_synth --frames 60
    python run_slam.py configs/cofusion.yaml \
        --set data_input_folder=data/cofusion_synth

Layouts:
  cofusion  colour/Color0NNN.png + depth_noise/Depth0NNN.exr +
            trajectories/gt-cam-0.txt          (CoFusionReader.cpp:36-60)
  replica   results/frame%06d.jpg + results/depth%06d.png + traj.txt
  tumrgbd   rgb/ + depth/ + rgb.txt/depth.txt/groundtruth.txt
  scannet   color/%d.jpg + depth/%d.png + pose/%d.txt
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import numpy as np


def _cv_pose(c2w_gl: np.ndarray) -> np.ndarray:
    """OpenGL c2w -> OpenCV c2w (the readers' conversion is an involution)."""
    from niceslam_tpu.io.datasets.base import opencv_to_opengl

    return opencv_to_opengl(c2w_gl)


def _quat_line(idx, c2w_cv) -> str:
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(c2w_cv[:3, :3]).as_quat()  # x, y, z, w
    t = c2w_cv[:3, 3]
    return (
        f"{idx} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
        f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}\n"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", required=True,
                    choices=["cofusion", "replica", "tumrgbd", "scannet"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--H", type=int, default=480)
    ap.add_argument("--W", type=int, default=640)
    ap.add_argument("--fx", type=float, default=360.0)
    ap.add_argument("--depth-scale", type=float, default=1000.0,
                    help="uint16 depth scale for png layouts")
    ap.add_argument("--arc", type=float, default=0.3,
                    help="trajectory arc_fraction: total orbit fraction "
                    "(>1 = multiple loops; keeps per-frame motion realistic "
                    "at reference-scale frame counts)")
    args = ap.parse_args()

    import cv2

    from niceslam_tpu.core.rays import Intrinsics
    from niceslam_tpu.io.datasets.synthetic import (
        circular_trajectory,
        render_box_scene,
    )

    intr = Intrinsics(
        H=args.H, W=args.W, fx=args.fx, fy=args.fx,
        cx=args.W / 2.0, cy=args.H / 2.0,
    )
    box = np.asarray(
        [[-4.5, 3.82], [-1.5, 2.02], [-3.0, 2.76]], np.float32
    ) * 0.9
    poses = circular_trajectory(args.frames, arc_fraction=args.arc)
    root = args.out
    os.makedirs(root, exist_ok=True)

    if args.layout == "cofusion":
        os.makedirs(os.path.join(root, "colour"), exist_ok=True)
        os.makedirs(os.path.join(root, "depth_noise"), exist_ok=True)
        os.makedirs(os.path.join(root, "trajectories"), exist_ok=True)
        traj = open(os.path.join(root, "trajectories", "gt-cam-0.txt"), "w")
    elif args.layout == "replica":
        os.makedirs(os.path.join(root, "results"), exist_ok=True)
        traj = open(os.path.join(root, "traj.txt"), "w")
    elif args.layout == "tumrgbd":
        os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(root, "depth"), exist_ok=True)
        rgb_list = open(os.path.join(root, "rgb.txt"), "w")
        dep_list = open(os.path.join(root, "depth.txt"), "w")
        traj = open(os.path.join(root, "groundtruth.txt"), "w")
        for f in (rgb_list, dep_list, traj):
            f.write("# synthetic fixture\n")
    else:  # scannet
        for d in ("color", "depth", "pose"):
            os.makedirs(os.path.join(root, d), exist_ok=True)
        traj = None

    for k, c2w in enumerate(poses):
        color, depth = render_box_scene(intr, c2w, box)
        bgr = (np.clip(color[..., ::-1], 0, 1) * 255).astype(np.uint8)
        cv_pose = _cv_pose(c2w)
        if args.layout == "cofusion":
            cv2.imwrite(os.path.join(root, "colour", f"Color0{k:03d}.png"), bgr)
            # float32 EXR (ZIP) via the framework's own encoder — no Python
            # imaging library in the image can write EXR (io/exr_write.py)
            from niceslam_tpu.io.exr_write import write_exr

            write_exr(
                os.path.join(root, "depth_noise", f"Depth0{k:03d}.exr"),
                depth.astype(np.float32),
            )
            traj.write(_quat_line(k, cv_pose))
        elif args.layout == "replica":
            cv2.imwrite(
                os.path.join(root, "results", f"frame{k:06d}.jpg"), bgr,
                [cv2.IMWRITE_JPEG_QUALITY, 97],
            )
            d16 = np.clip(depth * args.depth_scale, 0, 65535).astype(np.uint16)
            cv2.imwrite(os.path.join(root, "results", f"depth{k:06d}.png"), d16)
            traj.write(" ".join(f"{v:.9f}" for v in cv_pose.reshape(-1)) + "\n")
        elif args.layout == "tumrgbd":
            t = 1000.0 + 0.033 * k
            cv2.imwrite(os.path.join(root, "rgb", f"{t:.6f}.png"), bgr)
            d16 = np.clip(depth * args.depth_scale, 0, 65535).astype(np.uint16)
            cv2.imwrite(os.path.join(root, "depth", f"{t:.6f}.png"), d16)
            rgb_list.write(f"{t:.6f} rgb/{t:.6f}.png\n")
            dep_list.write(f"{t:.6f} depth/{t:.6f}.png\n")
            traj.write(_quat_line(f"{t:.6f}", cv_pose))
        else:  # scannet
            cv2.imwrite(
                os.path.join(root, "color", f"{k}.jpg"), bgr,
                [cv2.IMWRITE_JPEG_QUALITY, 97],
            )
            d16 = np.clip(depth * args.depth_scale, 0, 65535).astype(np.uint16)
            cv2.imwrite(os.path.join(root, "depth", f"{k}.png"), d16)
            np.savetxt(os.path.join(root, "pose", f"{k}.txt"), cv_pose)

    if args.layout == "tumrgbd":
        rgb_list.close()
        dep_list.close()
    if traj is not None:
        traj.close()
    print(f"{args.layout} fixture: {args.frames} frames -> {root}")


if __name__ == "__main__":
    main()
