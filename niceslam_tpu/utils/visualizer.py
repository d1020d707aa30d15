"""Frame visualizer: periodic rendered-vs-observed image dumps.

The reference config declares vis_freq / vis_inside_freq but contains no
visualizer (reference: config/nice_slam.yaml:33-34, unread — SURVEY.md §5).
This writes side-by-side panels (gt color | rendered color | gt depth |
rendered depth | residual) as PNG every ``vis_freq`` frames — the upstream
vis.py intent without a GUI dependency.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..render.renderer import render_image


def _colorize_depth(d, dmax=None):
    d = np.asarray(d)
    dmax = dmax or max(float(d.max()), 1e-6)
    x = np.clip(d / dmax, 0, 1)
    # simple perceptual ramp (dark blue -> yellow)
    rgb = np.stack([x, x**1.5, 1.0 - x], axis=-1)
    return (rgb * 255).astype(np.uint8)


def save_frame_vis(
    out_dir: str,
    frame_idx: int,
    params,
    grids,
    bounds,
    scene_bound,
    intr,
    c2w,
    gt_color,
    gt_depth,
    rcfg,
):
    os.makedirs(out_dir, exist_ok=True)
    out = render_image(
        params, grids, bounds, scene_bound, intr, jnp.asarray(c2w),
        jnp.asarray(gt_depth), "color", rcfg,
    )
    rc = np.clip(np.asarray(out.rgb), 0, 1)
    rd = np.asarray(out.depth)
    gc = np.asarray(gt_color)
    gd = np.asarray(gt_depth)
    dmax = max(float(gd.max()), 1e-6)
    panel = np.concatenate(
        [
            (gc * 255).astype(np.uint8),
            (rc * 255).astype(np.uint8),
            _colorize_depth(gd, dmax),
            _colorize_depth(rd, dmax),
            _colorize_depth(np.abs(gd - rd), dmax * 0.2),
        ],
        axis=1,
    )
    import cv2

    path = os.path.join(out_dir, f"frame_{frame_idx:06d}.png")
    cv2.imwrite(path, panel[..., ::-1])
    return path
