"""Co-Fusion sequence reader (colour PNG + EXR depth).

Equivalent of the reference reader (reference:
src/inputs/CoFusionReader.cpp:7-69), generalized and de-bugged:
arbitrary-width frame ids (the reference only handles 3-digit names,
§2.9.15), ground-truth trajectory ingestion when
``trajectories/gt-cam-0.txt`` exists (the reference pins c2w to identity),
and consistent reset semantics. EXR decode goes through OpenCV (the
reference vendors tinyexr); the optional native C++ prefetch path lives in
native/.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from .base import Frame, crop_frame, opencv_to_opengl, register


def _imread_exr(path: str) -> np.ndarray:
    # Preferred: the native C++ decoder (native/exr.cpp) — the framework's
    # own tinyexr-equivalent. OpenCV as fallback.
    from .. import native_loader

    if native_loader.available():
        try:
            return native_loader.read_exr(path)
        except IOError:
            pass  # unsupported compression -> fall through to OpenCV
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    import cv2

    img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    if img is None:
        raise IOError(f"failed to read EXR {path}")
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.float32)


def _imread_color(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"failed to read image {path}")
    return (img[..., ::-1] / 255.0).astype(np.float32)  # BGR -> RGB, [0,1]


def _load_cofusion_trajectory(path: str) -> dict[int, np.ndarray]:
    """Co-Fusion gt format: ``id tx ty tz qx qy qz qw`` per line."""
    poses = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) != 8:
                continue
            fid = int(float(parts[0]))
            tx, ty, tz, qx, qy, qz, qw = map(float, parts[1:])
            from scipy.spatial.transform import Rotation

            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :3] = Rotation.from_quat([qx, qy, qz, qw]).as_matrix()
            c2w[:3, 3] = [tx, ty, tz]
            poses[fid] = opencv_to_opengl(c2w)
    return poses


@register("cofusion")
class CoFusionReader:
    def __init__(self, cfg):
        self.root = cfg.data_input_folder
        self.crop = cfg.cam.crop_edge
        self.scale = cfg.cam.png_depth_scale
        self.color_paths = sorted(
            glob.glob(os.path.join(self.root, "colour", "*.png"))
        )
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.root, "depth_noise", "*.exr"))
        )
        if not self.depth_paths:
            self.depth_paths = sorted(
                glob.glob(os.path.join(self.root, "depth", "*.exr"))
            )
        n = min(len(self.color_paths), len(self.depth_paths))
        self.color_paths, self.depth_paths = (
            self.color_paths[:n],
            self.depth_paths[:n],
        )
        traj = os.path.join(self.root, "trajectories", "gt-cam-0.txt")
        self.poses = _load_cofusion_trajectory(traj) if os.path.exists(traj) else {}

    def __len__(self):
        return len(self.color_paths)

    def __getitem__(self, idx: int) -> Frame:
        color = _imread_color(self.color_paths[idx])
        depth = _imread_exr(self.depth_paths[idx])
        if self.scale not in (0.0, 1.0):
            depth = depth / self.scale
        color, depth = crop_frame(color, depth, self.crop)
        return Frame(
            idx=idx,
            color=color,
            depth=depth,
            gt_c2w=self.poses.get(idx),
        )
