"""Replica sequence reader (results/frameNNNNNN.jpg + depthNNNNNN.png, traj.txt).

No reference equivalent (the reference only ships the Co-Fusion reader);
format follows the public Replica-SLAM capture layout named by the
replica_room0 BASELINE config. traj.txt: 16 floats per line, row-major
OpenCV c2w, converted to the OpenGL convention.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from .base import Frame, crop_frame, opencv_to_opengl, register


@register("replica")
class ReplicaReader:
    def __init__(self, cfg):
        self.root = cfg.data_input_folder
        self.crop = cfg.cam.crop_edge
        self.scale = cfg.cam.png_depth_scale
        self.color_paths = sorted(
            glob.glob(os.path.join(self.root, "results", "frame*.jpg"))
        )
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.root, "results", "depth*.png"))
        )
        traj = os.path.join(self.root, "traj.txt")
        self.poses = []
        if os.path.exists(traj):
            with open(traj) as f:
                for line in f:
                    m = np.fromstring(line, sep=" ", dtype=np.float64)
                    if m.size == 16:
                        self.poses.append(
                            opencv_to_opengl(m.reshape(4, 4).astype(np.float32))
                        )

    def __len__(self):
        return len(self.color_paths)

    def __getitem__(self, idx: int) -> Frame:
        import cv2

        color = cv2.imread(self.color_paths[idx], cv2.IMREAD_COLOR)
        color = (color[..., ::-1] / 255.0).astype(np.float32)
        depth = cv2.imread(self.depth_paths[idx], cv2.IMREAD_ANYDEPTH)
        depth = depth.astype(np.float32) / self.scale
        color, depth = crop_frame(color, depth, self.crop)
        pose = self.poses[idx] if idx < len(self.poses) else None
        return Frame(idx=idx, color=color, depth=depth, gt_c2w=pose)
