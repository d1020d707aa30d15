"""Keyframe selection (overlap) and frustum-based feature masking.

TPU-native equivalents of the reference Mapper's geometry utilities:

- ``keyframe_overlap_percentages`` — project depth-spanned samples of the
  current frame into every keyframe, score by in-frustum fraction
  (reference: src/Mapper.cpp:132-196 keyframe_selection_overlap; the orphan
  prototype include/torchlib/utils.h:58-129). One jitted vmap over the whole
  ring buffer instead of a per-keyframe host loop.
- ``frustum_voxel_mask`` — per-level boolean voxel mask: voxel centers that
  project inside any window frame's image with camera-depth within
  (observed depth + 0.5 m) (reference: src/Mapper.cpp:42-130
  get_mask_from_c2w, whose cv::remap path is intent-only — SURVEY.md §2.9.9).
  Used as a *gradient mask* on grid updates instead of masked subtensor
  copies (§7.1), which keeps shapes static and avoids scatter churn.

Camera convention: OpenGL (-z forward), so "in front" is z_cam < 0 and the
projection uses (-x/z, y/z) — see core/rays.py.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.pose import invert_pose
from ..core.rays import Intrinsics, sample_rays


def _project(w2c: jnp.ndarray, intr: Intrinsics, pts: jnp.ndarray):
    """World points [N,3] -> (u, v, z_cam) under one w2c [4,4]."""
    cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = -cam[:, 0] / zs * intr.fx + intr.cx
    v = cam[:, 1] / zs * intr.fy + intr.cy
    return u, v, z


@partial(jax.jit, static_argnames=("intr", "pixels", "n_samples", "edge"))
def keyframe_overlap_percentages(
    key: jax.Array,
    intr: Intrinsics,
    c2w: jnp.ndarray,
    depth: jnp.ndarray,
    color: jnp.ndarray,
    kf_c2w: jnp.ndarray,  # [K, 4, 4]
    pixels: int = 100,
    n_samples: int = 16,
    edge: int = 20,
) -> jnp.ndarray:
    """Fraction of the current frame's surface volume visible per keyframe.

    ``pixels`` rays x ``n_samples`` depths spanning [0.8 d, d + 0.5]
    (src/Mapper.cpp:136-160), projected into every keyframe: returns [K].
    """
    batch = sample_rays(key, intr, c2w, depth, color, pixels)
    gt = batch.gt_depth.reshape(-1, 1)
    t = jnp.linspace(0.0, 1.0, n_samples)
    near, far = gt * 0.8, gt + 0.5
    z_vals = near * (1 - t) + far * t
    pts = (
        batch.rays_o[:, None, :] + batch.rays_d[:, None, :] * z_vals[..., None]
    ).reshape(-1, 3)
    # Zero-depth pixels carry no surface evidence: exclude from the score.
    pt_valid = jnp.repeat(batch.gt_depth > 0, n_samples)

    def percent_for(kf_pose):
        u, v, z = _project(invert_pose(kf_pose), intr, pts)
        inside = (
            (u > edge)
            & (u < intr.W - edge)
            & (v > edge)
            & (v < intr.H - edge)
            & (z < 0)
            & pt_valid
        )
        denom = jnp.maximum(jnp.sum(pt_valid), 1)
        return jnp.sum(inside) / denom

    return jax.vmap(percent_for)(kf_c2w)


@partial(
    jax.jit, static_argnames=("intr", "grid_shape_zyx")
)
def frustum_voxel_mask(
    poses: jnp.ndarray,  # [F, 4, 4] window-frame c2w
    pose_valid: jnp.ndarray,  # [F] bool
    depths: jnp.ndarray,  # [F, H, W]
    intr: Intrinsics,
    level_bound: jnp.ndarray,  # [3, 2]
    grid_shape_zyx: Tuple[int, int, int],
) -> jnp.ndarray:
    """[Z, Y, X] bool: voxels seen by at least one window frame.

    Semantics of src/Mapper.cpp:42-130 (intent): project voxel centers into
    each frame; keep those inside the (edge-cropped) image, in front of the
    camera, and with camera depth <= observed depth at that pixel + 0.5 m.
    """
    nz, ny, nx = grid_shape_zyx
    # Voxel centers under align_corners=True (ops/trilinear.py coords).
    xs = jnp.linspace(level_bound[0, 0], level_bound[0, 1], nx)
    ys = jnp.linspace(level_bound[1, 0], level_bound[1, 1], ny)
    zs = jnp.linspace(level_bound[2, 0], level_bound[2, 1], nz)
    Z, Y, X = jnp.meshgrid(zs, ys, xs, indexing="ij")
    pts = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)

    def seen_by(pose, valid, depth_img):
        u, v, z = _project(invert_pose(pose), intr, pts)
        iu = jnp.clip(jnp.round(u).astype(jnp.int32), 0, intr.W - 1)
        iv = jnp.clip(jnp.round(v).astype(jnp.int32), 0, intr.H - 1)
        obs = depth_img[iv, iu]
        in_img = (u >= 0) & (u < intr.W) & (v >= 0) & (v < intr.H)
        in_front = z < 0
        cam_depth = -z
        # Pixels with no depth reading keep the voxel (obs==0 -> no bound),
        # matching the remap-path intent of "carve only where observed".
        depth_ok = jnp.where(obs > 0, cam_depth <= obs + 0.5, True)
        return in_img & in_front & depth_ok & valid

    seen = jax.vmap(seen_by)(poses, pose_valid, depths)  # [F, Nvox]
    return jnp.any(seen, axis=0).reshape(nz, ny, nx)


def frustum_masks_for_levels(
    poses, pose_valid, depths, intr, bounds: Dict[str, jnp.ndarray], grids
) -> Dict[str, jnp.ndarray]:
    """Per-level [Z, Y, X, 1] float masks for gradient gating."""
    out = {}
    for lvl, g in grids.items():
        m = frustum_voxel_mask(
            poses, pose_valid, depths, intr, bounds[lvl], g.shape[:3]
        )
        out[lvl] = m[..., None].astype(g.dtype)
    return out
