"""Ray generation: pinhole back-projection and random pixel sampling.

TPU-native equivalent of the reference ray sampler
(reference: include/torchlib/utils.h:13-55 raySampler, :141-146 get_samples),
with the y-axis bug fixed (the reference computes ``j_t = (i - cy)/fy`` using
the column index for both axes — SURVEY.md §2.9.4).

Camera convention (matches upstream NICE-SLAM): x right, y up, camera looks
along **-z** (OpenGL). Dataset readers convert OpenCV-style (+z forward)
poses by negating the y and z basis columns.

Everything is shape-static and jit-friendly: sampling takes a PRNG key and a
static ray count; pixel gathers compile to XLA dynamic-gathers.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Pinhole intrinsics. Static python floats/ints so they become compile-time
    constants under jit (closure capture), never traced."""

    H: int
    W: int
    fx: float
    fy: float
    cx: float
    cy: float


def pixel_dirs(intr: Intrinsics, i: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame ray directions for pixel columns ``i`` and rows ``j``.

    OpenGL convention: ``[(i-cx)/fx, -(j-cy)/fy, -1]``.
    """
    return jnp.stack(
        [
            (i - intr.cx) / intr.fx,
            -(j - intr.cy) / intr.fy,
            -jnp.ones_like(i),
        ],
        axis=-1,
    )


def rays_for_image(intr: Intrinsics, c2w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel world-frame rays for the whole image.

    Returns ``(rays_o, rays_d)`` with shape ``[H, W, 3]``.
    """
    j, i = jnp.meshgrid(
        jnp.arange(intr.H, dtype=jnp.float32),
        jnp.arange(intr.W, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = pixel_dirs(intr, i, j)  # [H, W, 3]
    R = c2w[:3, :3]
    rays_d = dirs @ R.T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


class RayBatch(NamedTuple):
    """A sampled batch of rays with their supervision targets."""

    rays_o: jnp.ndarray  # [N, 3]
    rays_d: jnp.ndarray  # [N, 3]
    gt_depth: jnp.ndarray  # [N]
    gt_color: jnp.ndarray  # [N, 3]


def sample_rays(
    key: jax.Array,
    intr: Intrinsics,
    c2w: jnp.ndarray,
    depth: jnp.ndarray,
    color: jnp.ndarray,
    n: int,
    edge_h: int = 0,
    edge_w: int = 0,
) -> RayBatch:
    """Sample ``n`` random pixels inside the edge-cropped image and build rays.

    Equivalent of the reference's get_samples/raySampler
    (include/torchlib/utils.h:141, :13) — uniform pixels in
    ``[edge_h, H-edge_h) x [edge_w, W-edge_w)``, rays rotated into the world
    frame, ground-truth depth/color gathered at the sampled pixels.
    ``n`` is static so the kernel compiles once per ray budget.
    """
    kj, ki = jax.random.split(key)
    j = jax.random.randint(kj, (n,), edge_h, intr.H - edge_h)
    i = jax.random.randint(ki, (n,), edge_w, intr.W - edge_w)
    dirs = pixel_dirs(intr, i.astype(jnp.float32), j.astype(jnp.float32))
    R = c2w[:3, :3]
    rays_d = dirs @ R.T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    gt_depth = depth[j, i]
    gt_color = color[j, i]
    return RayBatch(rays_o, rays_d, gt_depth, gt_color)


def near_far_from_bound(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bound: jnp.ndarray,
    gt_depth: jnp.ndarray | None,
    n_samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray near/far for stratified sampling.

    Reference semantics (src/Renderer.cpp:52-78): near = 0.01 * gt_depth
    (broadcast over samples); far = (slab-exit distance of the ray against
    the axis-aligned scene bound) + 0.01, clamped to at most
    ``1.2 * max(gt_depth)`` when depth supervision exists.

    Returns ``near [N, n_samples]``, ``far [N, 1]``.
    """
    # Slab method: t at which each coordinate hits each bound face.
    t = (bound[None, :, :] - rays_o[:, :, None]) / rays_d[:, :, None]  # [N,3,2]
    far_bb = jnp.min(jnp.max(t, axis=2), axis=1)[:, None] + 0.01  # [N,1]
    if gt_depth is None:
        near = jnp.full((rays_o.shape[0], n_samples), 0.01, rays_o.dtype)
        return near, far_bb
    gt = gt_depth.reshape(-1, 1)
    near = jnp.tile(gt * 0.01, (1, n_samples))
    far = jnp.clip(far_bb, 0.0, jnp.max(gt * 1.2))
    return near, far
