"""Per-ray volumetric renderer over the grid hierarchy.

TPU-native re-design of the reference renderer
(reference: src/Renderer.cpp:44-126 render_batch_ray, :19-42 eval_points).
Semantics preserved:

- near = 0.01 * gt_depth; far = min(ray-exit from the scene bound + 0.01,
  1.2 * max gt_depth) (src/Renderer.cpp:52-78);
- 16 surface samples in [0.95, 1.05] * gt_depth (zero-depth rows span
  [1e-3, max gt]) + 32 stratified samples, sort-merged (:80-119);
- out-of-bound points get occupancy overridden to +100 (forced opaque,
  :26-36) — implemented as a where-mask, not an index_put;
- compositing via core/compositing.py (utils.h:148-172).

Design inversions for TPU: no 100k-point chunked python loop — a ray batch is
one static-shape jitted evaluation (200x48 or 1000x48 points), so the whole
stack (grid gathers -> tiny MLPs -> compositing) compiles into one XLA
program; full-image rendering lax.maps over fixed-size row chunks instead.
The z-value construction runs on stop_gradient'ed rays (the reference's
NoGradGuard block) while the sample *points* keep the live rays, so pose
gradients flow exactly as upstream intends (and not through the sampler —
fixing SURVEY.md §2.9.3's severed-graph defect by construction).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..core import compositing, rays as rays_mod, sampling
from ..models.decoders import nice_forward


class RenderConfig(NamedTuple):
    n_samples: int = 32  # stratified (config/nice_slam.yaml N_samples)
    n_surface: int = 16  # depth-guided (N_surface)
    n_importance: int = 0  # (N_importance; 0 in every shipped config)
    perturb: float = 0.0
    lindisp: bool = False
    occupancy: bool = True
    # Surface-sample half-band as a fraction of gt depth (upstream
    # hard-codes 0.05, src/Renderer.cpp:85). Sample spacing 2*band*gt/(n-1)
    # lower-bounds render-depth accuracy — see core/sampling.surface_z_vals.
    surface_band: float = 0.05


def render_rays(
    params,
    grids: Dict[str, jnp.ndarray],
    bounds: Dict[str, jnp.ndarray],
    scene_bound: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray | None,
    stage: str,
    cfg: RenderConfig = RenderConfig(),
    key: jax.Array | None = None,
) -> compositing.RenderOutputs:
    """Render a ray batch ``[N, 3]`` at the given stage.

    ``gt_depth=None`` renders without depth guidance (no surface samples,
    near=0.01 — the reference's undefined-gt_depth path).
    """
    det_o = jax.lax.stop_gradient(rays_o)
    det_d = jax.lax.stop_gradient(rays_d)
    n_surface = cfg.n_surface if gt_depth is not None else 0

    near, far = rays_mod.near_far_from_bound(
        det_o, det_d, scene_bound, gt_depth, cfg.n_samples
    )
    z_strat = sampling.stratified_z_vals(
        near, far, cfg.n_samples, cfg.perturb, key
    )
    if n_surface > 0:
        z_surf = sampling.surface_z_vals(gt_depth, n_surface, cfg.surface_band)
        z_vals = sampling.merge_z_vals(z_strat, z_surf)
    else:
        z_vals = z_strat

    def eval_composite(z_vals):
        pts = sampling.points_along_rays(rays_o, rays_d, z_vals)  # [N, S, 3]
        n_rays, S = pts.shape[0], pts.shape[1]
        flat = pts.reshape(-1, 3)
        raw = nice_forward(params, grids, flat, bounds, stage)  # [N*S, 4]

        # Out-of-bound override (src/Renderer.cpp:26-36): occupancy := 100.
        inside = jnp.all(
            (flat > scene_bound[:, 0]) & (flat < scene_bound[:, 1]), axis=-1
        )
        occ = jnp.where(inside, raw[:, 3], 100.0)
        full = jnp.concatenate([raw[:, :3], occ[:, None]], axis=-1)
        full = full.reshape(n_rays, S, 4)
        out = compositing.raw_to_outputs(
            full, z_vals, rays_d, occupancy=cfg.occupancy
        )
        # Per-sample auxiliaries for the mapper's direct occupancy
        # supervision: PRE-override logits (forced-opaque OOB values are not
        # decoder outputs and must not receive supervision gradients).
        return out._replace(
            occ=raw[:, 3].reshape(n_rays, S),
            z_vals=z_vals,
            sample_valid=inside.reshape(n_rays, S),
        )

    out = eval_composite(z_vals)
    if cfg.n_importance > 0:
        # Hierarchical pass: importance-sample where the first pass put
        # weight, merge, re-evaluate (upstream N_importance semantics).
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_imp = sampling.sample_pdf(
            mids,
            jax.lax.stop_gradient(out.weights[..., 1:-1]),
            cfg.n_importance,
            key,
        )
        z_all = sampling.merge_z_vals(z_vals, jax.lax.stop_gradient(z_imp))
        out = eval_composite(z_all)
    return out


@partial(jax.jit, static_argnames=("intr", "stage", "cfg", "rows_per_chunk"))
def render_image(
    params,
    grids,
    bounds,
    scene_bound,
    intr: rays_mod.Intrinsics,
    c2w: jnp.ndarray,
    gt_depth: jnp.ndarray | None = None,
    stage: str = "color",
    cfg: RenderConfig = RenderConfig(),
    rows_per_chunk: int = 16,
):
    """Render a full image by mapping fixed-size row chunks (for vis/eval).

    Static chunking replaces the reference's 100k-point python loop
    (src/Renderer.cpp:22): ``lax.map`` over [rows_per_chunk * W] ray blocks
    keeps one compiled program and bounds device memory.
    """
    ro, rd = rays_mod.rays_for_image(intr, c2w)
    H, W = intr.H, intr.W
    # Pad H up to a multiple of rows_per_chunk (crop-edged heights are not
    # generally divisible); padded rows render garbage that is cropped off.
    pad = (-H) % rows_per_chunk
    Hp = H + pad
    if pad:
        ro = jnp.concatenate([ro, jnp.broadcast_to(ro[-1:], (pad, W, 3))], 0)
        rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, W, 3))], 0)
        if gt_depth is not None:
            gt_depth = jnp.concatenate(
                [gt_depth, jnp.broadcast_to(gt_depth[-1:], (pad, W))], 0
            )
    n_chunks = Hp // rows_per_chunk
    ro = ro.reshape(n_chunks, rows_per_chunk * W, 3)
    rd = rd.reshape(n_chunks, rows_per_chunk * W, 3)
    gd = (
        gt_depth.reshape(n_chunks, rows_per_chunk * W)
        if gt_depth is not None
        else None
    )

    def chunk(args):
        o, d, g = args
        return render_rays(
            params, grids, bounds, scene_bound, o, d, g, stage, cfg
        )

    if gd is None:
        out = jax.lax.map(
            lambda od: chunk((od[0], od[1], None)), (ro, rd)
        )
    else:
        out = jax.lax.map(chunk, (ro, rd, gd))
    return compositing.RenderOutputs(
        rgb=out.rgb.reshape(Hp, W, 3)[:H],
        depth=out.depth.reshape(Hp, W)[:H],
        depth_var=out.depth_var.reshape(Hp, W)[:H],
        weights=out.weights.reshape(Hp, W, -1)[:H],
    )
