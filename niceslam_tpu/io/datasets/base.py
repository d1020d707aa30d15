"""Dataset reader base: RGB-D frame ingest.

TPU-native replacement for the reference's single Co-Fusion reader
(reference: src/inputs/CoFusionReader.cpp, include/inputs/CoFusionReader.h)
— generalized to the dataset families the BASELINE configs name (Co-Fusion,
Replica, TUM RGB-D, ScanNet, Apartment) plus a synthetic analytic scene.

Decode is host-side (file I/O is not a TPU workload; SURVEY.md §2.1.7);
normalization/scaling happens on host numpy here, and frames stream to the
device through io/prefetch.py. Readers fix the reference reader's defects by
construction (frame-id formatting, reset semantics, never-updated c2w —
SURVEY.md §2.9.15).

Pose convention: readers return **OpenGL-style c2w** (x right, y up, -z
forward) as float32 [4, 4]; OpenCV-style sources are converted by negating
the y/z basis columns (the upstream convention).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Protocol

import numpy as np


@dataclass
class Frame:
    idx: int
    color: np.ndarray  # [H, W, 3] float32 in [0, 1]
    depth: np.ndarray  # [H, W] float32 meters (0 = invalid)
    gt_c2w: Optional[np.ndarray]  # [4, 4] float32 OpenGL c2w, or None


class FrameReader(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, idx: int) -> Frame: ...


def opencv_to_opengl(c2w: np.ndarray) -> np.ndarray:
    """Negate the y and z basis columns (upstream dataset convention)."""
    out = np.asarray(c2w, np.float32).copy()
    out[:3, 1] *= -1
    out[:3, 2] *= -1
    return out


def crop_frame(color, depth, crop_edge: int):
    if crop_edge > 0:
        color = color[crop_edge:-crop_edge, crop_edge:-crop_edge]
        depth = depth[crop_edge:-crop_edge, crop_edge:-crop_edge]
    return color, depth


def iterate(reader: FrameReader) -> Iterator[Frame]:
    for i in range(len(reader)):
        yield reader[i]


_REGISTRY = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def get_dataset(cfg) -> FrameReader:
    """Construct the reader named by ``cfg.dataset`` from an SLAMConfig."""
    if cfg.dataset not in _REGISTRY:
        raise KeyError(
            f"unknown dataset {cfg.dataset!r}; have {sorted(_REGISTRY)}"
        )
    return _REGISTRY[cfg.dataset](cfg)
