"""Mapper: staged joint optimization of grids + decoders (+ poses under BA).

TPU-native re-design of the reference Mapper
(reference: src/Mapper.cpp:198-491 optimize_map, :493-552 run). The
reference's python-side(-style) loop — per-iteration param-group LR pokes,
masked grid subtensor copies, ad-hoc H2D traffic — becomes a small number of
jitted ``lax.scan`` programs, one per stage, sharing one Adam state:

- stage schedule middle (<= 40%) -> fine (<= 60%) -> color with the config
  LR table (config/nice_slam.yaml mapping.stage; fixing the reference's
  fine-window-maps-to-middle bug, SURVEY.md §2.9.8);
- per-stage, per-group learning rates via a *LR pytree* applied after
  ``scale_by_adam`` — the functional equivalent of upstream's
  ``optimizer.param_groups[i]['lr'] = ...`` mutation;
- frustum feature selection as a gradient mask on grid leaves (same math as
  masked-subtensor optimization: untouched voxels receive exactly zero
  update; SURVEY.md §7.1) instead of index_put_ writeback
  (src/Mapper.cpp:254-290, 448-464);
- bundle adjustment: window-frame camera tensors optimized only in the color
  stage at BA_cam_lr, oldest frame pinned (upstream semantics);
- only the fine (if not fix_fine) and color (if not fix_color) decoders ever
  train — middle/coarse decoders stay frozen (pretrained import,
  models/pretrained.py).

The window is static-shape: ``F = mapping_window_size`` frames of stacked
color/depth/pose arrays with a validity mask, so one compiled program serves
every mapping call with the same (plan, F) signature.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.pose import camera_from_tensor, tensor_from_camera, to_homogeneous
from ..core.rays import Intrinsics, RayBatch, pixel_dirs
from ..render.renderer import RenderConfig, render_rays
from ..config.schema import StageLR


class MapOptConfig(NamedTuple):
    """Static knobs of one optimize_map invocation."""

    pixels: int = 1000
    w_color_loss: float = 0.2
    BA: bool = False
    BA_cam_lr: float = 1e-3
    fix_fine: bool = True
    fix_color: bool = False
    frustum_feature_selection: bool = True
    lr_factor: float = 1.0
    # No pretrained checkpoints configured -> the decoders must themselves
    # train (upstream ships pretrained ConvONet decoders and freezes
    # middle/fine — config/nice_slam.yaml:13-15,51; without them a frozen
    # random decoder caps map quality). Stages whose decoders_lr is 0 in the
    # upstream LR table fall back to `decoders_lr_fallback`.
    train_all_decoders: bool = False
    decoders_lr_fallback: float = 0.005


# A stage plan entry: (stage_name, n_iters, StageLR). Tuples of these are
# hashable -> valid static jit arguments.
StagePlan = Tuple[Tuple[str, int, StageLR], ...]


def build_stage_plan(
    num_joint_iters: int,
    middle_iter_ratio: float,
    fine_iter_ratio: float,
    cfg_stage_lr,
    coarse: bool = False,
) -> StagePlan:
    """Split the joint-iteration budget into stage segments.

    Iteration i maps to: middle if i <= int(N*mr), fine if i <= int(N*fr),
    else color (upstream schedule; the reference's broken remap §2.9.8 is
    not reproduced). The coarse mapper runs every iteration at stage coarse.
    """
    n = num_joint_iters
    if coarse:
        return (("coarse", n, cfg_stage_lr("coarse")),)
    n_mid = min(int(n * middle_iter_ratio) + 1, n)
    n_fine = max(min(int(n * fine_iter_ratio) + 1, n) - n_mid, 0)
    n_color = n - n_mid - n_fine
    plan = []
    if n_mid:
        plan.append(("middle", n_mid, cfg_stage_lr("middle")))
    if n_fine:
        plan.append(("fine", n_fine, cfg_stage_lr("fine")))
    if n_color:
        plan.append(("color", n_color, cfg_stage_lr("color")))
    return tuple(plan)


def _grid_lr(level: str, lrs: StageLR) -> float:
    return {
        "coarse": lrs.coarse_lr,
        "middle": lrs.middle_lr,
        "fine": lrs.fine_lr,
        "color": lrs.color_lr,
    }[level]


def _decoder_lr(level: str, lrs: StageLR, cfg: MapOptConfig) -> float:
    if cfg.train_all_decoders:
        # Unpretrained run: every decoder trains in the stages that use it
        # (decoders a stage's forward does not touch get zero grads anyway).
        if level == "color" and cfg.fix_color:
            return 0.0
        return (
            lrs.decoders_lr
            if lrs.decoders_lr > 0
            else cfg.decoders_lr_fallback
        )
    if level == "fine" and not cfg.fix_fine:
        return lrs.decoders_lr
    if level == "color" and not cfg.fix_color:
        return lrs.decoders_lr
    return 0.0


def _lr_tree(all_params, stage_lrs: StageLR, stage: str, cfg: MapOptConfig):
    """LR pytree matching {grids, decoders, cams} for one stage."""
    f = cfg.lr_factor
    grids_lr = {
        lvl: _grid_lr(lvl, stage_lrs) * f for lvl in all_params["grids"]
    }
    dec_lr = {
        lvl: jax.tree_util.tree_map(
            lambda _: _decoder_lr(lvl, stage_lrs, cfg) * f, sub
        )
        for lvl, sub in all_params["decoders"].items()
    }
    cam_lr = cfg.BA_cam_lr if (cfg.BA and stage == "color") else 0.0
    return {"grids": grids_lr, "decoders": dec_lr, "cams": cam_lr}


def mapping_loss(
    all_params,
    bounds,
    scene_bound,
    intr: Intrinsics,
    colors,  # [F, H, W, 3]
    depths,  # [F, H, W]
    frame_valid,  # [F] bool
    cam_fixed,  # [F] bool — pose receives no gradient (oldest/invalid)
    key,
    stage: str,
    cfg: MapOptConfig,
    rcfg: RenderConfig,
    n_pixels: int,
):
    """One joint-iteration loss over the keyframe window.

    Sum of per-ray depth L1 over gt>0 pixels (+ w_color * color L1 in the
    color stage), src/Mapper.cpp:435-446 / upstream. Rays originate from the
    *current* camera tensors so BA gradients flow into poses.

    The reference splits the pixel budget as pixels/len(valid frames) per
    frame (src/Mapper.cpp:376), which would retrace this program for every
    distinct valid count. Instead each of the ``n_pixels`` rays draws its
    source frame uniformly from the valid window slots (same budget and the
    same per-frame expectation) — ONE compiled program serves every window
    occupancy.
    """
    grids, decoders, cams = (
        all_params["grids"],
        all_params["decoders"],
        all_params["cams"],
    )
    # Pin fixed poses: stop_gradient blend keeps shapes static.
    cams = jnp.where(
        cam_fixed[:, None], jax.lax.stop_gradient(cams), cams
    )
    c2ws = to_homogeneous(camera_from_tensor(cams))  # [F, 4, 4]

    kf_key, kj, ki = jax.random.split(key, 3)
    logits = jnp.where(frame_valid, 0.0, -jnp.inf)
    fidx = jax.random.categorical(kf_key, logits, shape=(n_pixels,))
    j = jax.random.randint(kj, (n_pixels,), 0, intr.H)
    i = jax.random.randint(ki, (n_pixels,), 0, intr.W)
    dirs = pixel_dirs(intr, i.astype(jnp.float32), j.astype(jnp.float32))
    R = c2ws[fidx, :3, :3]  # [N, 3, 3]
    flat = RayBatch(
        rays_o=c2ws[fidx, :3, 3],
        rays_d=jnp.einsum("nij,nj->ni", R, dirs),
        gt_depth=depths[fidx, j, i],
        gt_color=colors[fidx, j, i],
    )
    ray_w = frame_valid[fidx].astype(jnp.float32)
    # Multi-chip: partition the ray batch across the mesh (no-op when no
    # mesh is active). XLA then psums the replicated-param grads (parallel/).
    from ..parallel.mesh import shard_rays

    flat = shard_rays(flat)
    ray_w = shard_rays(ray_w)

    out = render_rays(
        decoders, grids, bounds, scene_bound,
        flat.rays_o, flat.rays_d, flat.gt_depth, stage, rcfg,
    )
    depth_mask = (flat.gt_depth > 0).astype(jnp.float32) * ray_w
    loss = jnp.sum(jnp.abs(flat.gt_depth - out.depth) * depth_mask)
    if stage == "color":
        closs = jnp.sum(
            jnp.abs(flat.gt_color - out.rgb) * ray_w[:, None]
        )
        loss = loss + cfg.w_color_loss * closs
    return loss


@partial(
    jax.jit,
    static_argnames=("intr", "plan", "cfg", "rcfg", "n_pixels"),
)
def optimize_window(
    grids,
    decoders,
    cam_tensors,  # [F, 7]
    grid_masks,  # per-level [Z, Y, X, 1] float (frustum feature selection)
    bounds,
    scene_bound,
    intr: Intrinsics,
    colors,
    depths,
    frame_valid,
    cam_fixed,
    key,
    plan: StagePlan,
    cfg: MapOptConfig,
    rcfg: RenderConfig,
    n_pixels: int,
):
    """Run the full staged mapping optimization; one XLA program per stage.

    Returns ``(grids, decoders, cam_tensors, losses)`` where ``losses`` is
    the concatenated loss curve across stages.
    """
    all_params = {"grids": grids, "decoders": decoders, "cams": cam_tensors}
    adam = optax.scale_by_adam()
    opt_state = adam.init(all_params)

    def mask_grid_grads(g):
        if not cfg.frustum_feature_selection:
            return g
        return {
            "grids": {
                lvl: g["grids"][lvl] * grid_masks[lvl]
                for lvl in g["grids"]
            },
            "decoders": g["decoders"],
            "cams": g["cams"],
        }

    losses_all = []
    offset = 0
    for stage, n_iters, stage_lrs in plan:
        lr_tree = _lr_tree(all_params, stage_lrs, stage, cfg)
        loss_grad = jax.value_and_grad(
            lambda p, k: mapping_loss(
                p, bounds, scene_bound, intr, colors, depths, frame_valid,
                cam_fixed, k, stage, cfg, rcfg, n_pixels,
            )
        )

        def step(carry, it, loss_grad=loss_grad, lr_tree=lr_tree):
            params, opt_state = carry
            loss, g = loss_grad(params, jax.random.fold_in(key, it))
            g = mask_grid_grads(g)
            updates, opt_state = adam.update(g, opt_state, params)
            # lr_tree mirrors the param structure with python-float leaves,
            # so this is the functional form of upstream's per-group
            # param_groups[i]['lr'] pokes.
            updates = jax.tree_util.tree_map(
                lambda u, lr: -lr * u, updates, lr_tree
            )
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (all_params, opt_state), losses = jax.lax.scan(
            step, (all_params, opt_state), jnp.arange(offset, offset + n_iters)
        )
        offset += n_iters
        losses_all.append(losses)

    from ..parallel.mesh import replicate

    return replicate(
        (
            all_params["grids"],
            all_params["decoders"],
            all_params["cams"],
            jnp.concatenate(losses_all),
        )
    )


def optimize_map(*args, **kwargs):
    """Alias kept for the public API surface (SURVEY.md §3.4 naming)."""
    return optimize_window(*args, **kwargs)
