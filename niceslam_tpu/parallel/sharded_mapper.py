"""Z-sharded mapping program: map-volume x ray-batch 2-D parallelism.

The distributed mapping step of the system (SURVEY.md §5 "Long-context",
§7.2 step 6; the reference has zero distributed code — SURVEY.md §2.2).
Runs the SAME staged optimization as ``slam.mapper.run_schedule``, but as a
``shard_map`` over a 2-D ``('map', 'kf')`` device mesh:

- every feature grid's Z axis is block-sharded over ``map`` (the map no
  longer has to fit one chip's HBM); trilinear reads across block borders
  ride a one-row ``ppermute`` halo exchange and a feature ``psum``
  (grid/shard.py — the ring-shaped primitive of this workload);
- the ray batch is sharded over ``kf``: every device draws the SAME
  deterministic ``n_pixels`` pixel set and evaluates its own slice
  (mapper.mapping_loss ``ray_shard``), so the union over ``kf`` is exactly
  the unsharded ray set — the sharded program is numerically the unsharded
  program, which the parity test asserts directly;
- per-device gradients are combined with explicit collectives: decoder /
  camera grads and the loss ``psum`` over ``kf`` (they are already
  replicated over ``map`` because features were psum-assembled); grid-block
  grads ``psum`` over ``kf`` only — each device owns its Z block, and the
  halo row's contribution is routed back to its owner by the autodiff
  transpose of the ``ppermute``.

Grids must be Z-padded so each level divides the ``map`` axis. Padding is
EDGE-REPLICATED with the level bound extended by the same voxels
(`pad_grid_for_sharding`): align_corners keeps the world->voxel mapping of
real rows bit-identical and the replicated rows reproduce border-clamp
semantics exactly, so every other consumer (tracker, renderer, mesher)
samples padded grids unchanged.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..grid.shard import _local_sample
from ..ops.trilinear import override_sampler
from ..slam.mapper import (
    ProgConfig,
    Schedule,
    STAGE_ORDER,
    freeze_for_stage,
    lr_tree_from_rows,
    mapping_loss,
)

MAP_AXIS = "map"
KF_AXIS = "kf"


def make_slam_mesh_2d(
    n_map: int, n_kf: int, devices=None
) -> Mesh:
    """('map', 'kf') mesh: Z-block grid sharding x ray-batch sharding."""
    if devices is None:
        devices = jax.devices()
    assert n_map * n_kf <= len(devices), (
        f"mesh {n_map}x{n_kf} needs {n_map * n_kf} devices, "
        f"have {len(devices)}"
    )
    arr = np.asarray(devices[: n_map * n_kf]).reshape(n_map, n_kf)
    return Mesh(arr, (MAP_AXIS, KF_AXIS))


def pad_grid_for_sharding(
    grid: jnp.ndarray, bound: jnp.ndarray, n_map: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-replicate pad Z to a multiple of ``n_map``; extend the bound.

    With align_corners the voxel world-size is ``(hi-lo)/(Z-1)``; adding p
    replicated rows and raising the z bound by ``p * voxel`` keeps the
    world->index map of all real rows bit-identical, and samples past the
    old border hit replica rows = border-clamp values. Bit-exact for every
    existing consumer.
    """
    z = grid.shape[0]
    zp = -(-z // n_map) * n_map
    if zp == z:
        return grid, bound
    p = zp - z
    grid = jnp.concatenate(
        [grid, jnp.broadcast_to(grid[-1:], (p,) + grid.shape[1:])], axis=0
    )
    voxel = (bound[2, 1] - bound[2, 0]) / (z - 1)
    bound = bound.at[2, 1].add(p * voxel)
    return grid, bound


def _halo_sample_impl(grid_blk, pts, bound, map_axis=MAP_AXIS):
    """Per-device trilinear sampler for the shard_map body.

    Delegates to THE halo-sampler implementation (grid/shard._local_sample —
    packed corner-table gather + one-row ppermute halo + psum); the logical
    Z here is always ``zb * n_map`` because attach() pads every level to
    divide the map axis (parallel/runtime.pad_grid_for_sharding).
    """
    nz = grid_blk.shape[0] * jax.lax.axis_size(map_axis)
    return _local_sample(grid_blk, pts, bound, nz, map_axis)


@jax.custom_vjp
def _halo_sample(grid_blk, pts, bound):
    return _halo_sample_impl(grid_blk, pts, bound)


def _halo_sample_fwd(grid_blk, pts, bound):
    return jax.vjp(_halo_sample_impl, grid_blk, pts, bound)


def _halo_sample_bwd(vjp_fn, ct):
    """SPMD-correct adjoint of the halo sampler, differentiated INSIDE the
    shard_map body.

    Two corrections over the default VJP:

    1. **1/n_map de-duplication.** Under shard_map's per-device autodiff the
       transpose of ``psum`` is ``psum`` — which computes the gradient of
       the SUM of the per-device replica losses. Every use site of this
       sampler (the mapping loss) is map-replicated downstream of the
       feature psum, so the arriving cotangent ``ct`` is identical on all
       map devices and every input cotangent comes out exactly
       ``n_map``-fold. (Adam's scale invariance masks a constant factor,
       but parity must be exact.)
    2. **Cross-block point cotangent.** Each device's local trilerp only
       sees its own block's contribution to d(out)/d(pts); the rays/poses
       that produced ``pts`` are replicated over `map`, so their gradient
       must be the full cross-block sum (BA pose grads were short by the
       cross-block terms without this) — hence the extra psum on d_pts /
       d_bound. Grid-block cotangents stay local (each device owns its
       block; the halo row is routed home by the ppermute transpose).
    """
    inv_n = 1.0 / jax.lax.axis_size(MAP_AXIS)
    d_grid, d_pts, d_bound = vjp_fn(ct)
    return (
        d_grid * inv_n,
        jax.lax.psum(d_pts, MAP_AXIS) * inv_n,
        jax.lax.psum(d_bound, MAP_AXIS) * inv_n,
    )


_halo_sample.defvjp(_halo_sample_fwd, _halo_sample_bwd)


def _tv_term(grids_blk):
    """Grid-smoothness (TV) term of the Z-sharded program — the exact value
    and gradient of ``mapper.mapping_loss``'s tv expression evaluated on the
    logically-concatenated grid.

    Per map device: local y/x/z squared forward differences over its own Z
    block, plus the one cross-block z difference (my last row vs the next
    block's first row, fetched with a one-row ``ppermute`` — its autodiff
    transpose routes that row's cotangent back to its owner). The full-grid
    VALUE is assembled with a ``psum`` hidden behind ``stop_gradient`` so the
    differentiable path stays purely local (a differentiable psum would make
    each device's cotangent ``n_map``-fold under shard_map's per-device
    transpose — the same over-count _halo_sample_bwd corrects).

    The caller scales by ``tv_weight / kf_n``: TV is identical on every kf
    replica (grids are kf-replicated), so the explicit grad ``psum`` over
    KF_AXIS restores exactly 1x.
    """
    n_map = jax.lax.axis_size(MAP_AXIS)
    mi = jax.lax.axis_index(MAP_AXIS)
    perm = [(i, (i - 1) % n_map) for i in range(n_map)]
    tv = 0.0
    for lvl in ("middle", "fine"):
        g = grids_blk[lvl]
        zb, Y, X, C = g.shape
        Z = zb * n_map
        sy = jnp.sum(jnp.square(g[:, 1:] - g[:, :-1]))
        sx = jnp.sum(jnp.square(g[:, :, 1:] - g[:, :, :-1]))
        sz = jnp.sum(jnp.square(g[1:] - g[:-1]))
        # Cross-block boundary difference (absent on the last block).
        nxt_first = jax.lax.ppermute(g[:1], MAP_AXIS, perm)[0]
        sb = jnp.where(
            mi < n_map - 1, jnp.sum(jnp.square(nxt_first - g[-1])), 0.0
        )
        local = (
            sy / (Z * (Y - 1) * X * C)
            + sx / (Z * Y * (X - 1) * C)
            + (sz + sb) / ((Z - 1) * Y * X * C)
        )
        full = jax.lax.psum(local, MAP_AXIS)
        tv = tv + local + jax.lax.stop_gradient(full - local)
    return tv


def _body(
    grids_blk,
    decoders,
    cams,
    masks_blk,
    bounds,
    scene_bound,
    colors,
    depths,
    frame_valid,
    cam_fixed,
    key,
    sched: Schedule,
    opt_state,
    *,
    intr,
    pcfg: ProgConfig,
    rcfg,
):
    """Per-device body of the sharded mapping program (shard_map)."""
    kf_n = jax.lax.axis_size(KF_AXIS)
    kf_i = jax.lax.axis_index(KF_AXIS)
    n_local = pcfg.n_pixels // kf_n
    ray_start = kf_i * n_local

    params = {"grids": grids_blk, "decoders": decoders, "cams": cams}
    adam = optax.scale_by_adam()

    def step(carry, xs):
        # Mirrors mapper._scan_step exactly (elementwise act-gating instead
        # of a lax.cond skip — the cond carry-copied the whole params+moments
        # pytree per iteration; same fix, same parity): pad rows leave params
        # and moments bit-identical and report loss 0.
        it, sid, lg, ld, lc, act = xs
        params, opt_state = carry

        def branch(stage):
            def f(p, k):
                return mapping_loss(
                    freeze_for_stage(p, stage, pcfg), bounds, scene_bound,
                    intr, colors, depths, frame_valid, cam_fixed, k, stage,
                    pcfg.w_color_loss, rcfg, pcfg.n_pixels,
                    ray_shard=(ray_start, n_local),
                    # Per-ray like the main loss: each kf shard evaluates
                    # its slice and the explicit psum below reconstitutes
                    # exactly the unsharded term (unlike tv_weight, no
                    # special handling needed).
                    fs_weight=pcfg.fs_weight, fs_band=pcfg.fs_band,
                )

            return f

        def loss_fn(p, k):
            loss = jax.lax.switch(
                sid, [branch(s) for s in STAGE_ORDER], p, k
            )
            if pcfg.tv_weight > 0.0:
                # Stage-independent (every switch branch adds the same term
                # in the unsharded program); 1/kf_n cancels the grad psum
                # over KF_AXIS below.
                loss = loss + (pcfg.tv_weight / kf_n) * _tv_term(p["grids"])
            return loss

        loss, g = jax.value_and_grad(loss_fn)(
            params, jax.random.fold_in(key, it)
        )
        # Explicit gradient collectives (XLA cannot infer them through
        # shard_map): the total loss/grads are sums over the kf ray
        # shards. Grid-block grads stay local over `map` (each device
        # owns its block; halo contributions already routed home by the
        # ppermute transpose inside the sampler's VJP).
        loss = jax.lax.psum(loss, KF_AXIS)
        g = {
            "grids": jax.lax.psum(g["grids"], KF_AXIS),
            "decoders": jax.lax.psum(g["decoders"], KF_AXIS),
            "cams": jax.lax.psum(g["cams"], KF_AXIS),
        }
        updates, new_opt_state = adam.update(g, opt_state, params)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(act, new, old), new_opt_state,
            opt_state,
        )
        lr_tree = lr_tree_from_rows(params, lg, ld, lc)
        if pcfg.frustum:
            mask_tree = {
                "grids": {lvl: masks_blk[lvl] for lvl in params["grids"]},
                "decoders": jax.tree_util.tree_map(
                    lambda _: 1.0, params["decoders"]
                ),
                "cams": 1.0,
            }
            updates = jax.tree_util.tree_map(
                lambda u, lr, mk: jnp.where(act, (-lr) * u * mk, 0.0),
                updates, lr_tree, mask_tree,
            )
        else:
            updates = jax.tree_util.tree_map(
                lambda u, lr: jnp.where(act, (-lr) * u, 0.0),
                updates, lr_tree,
            )
        params = optax.apply_updates(params, updates)
        return (params, opt_state), jnp.where(act, loss, 0.0)

    with override_sampler(_halo_sample):
        xs = (sched.iter_idx, sched.stage_ids, sched.lr_grids,
              sched.lr_dec, sched.lr_cam, sched.active)
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), xs
        )
    return (
        params["grids"],
        params["decoders"],
        params["cams"],
        opt_state,
        losses,
    )


def make_sharded_run_schedule(mesh: Mesh):
    """Build a drop-in ``slam.mapper.run_schedule`` replacement that runs the
    mapping step Z-sharded over ``mesh`` (axes ('map','kf')).

    Grids (and frustum masks, and the Adam moments of grid leaves) are
    Z-block sharded; everything else is replicated. Requires every grid's Z
    divide the map axis — see ``pad_grid_for_sharding``.
    """
    g_spec = P(MAP_AXIS)
    r_spec = P()
    param_spec = {"grids": g_spec, "decoders": r_spec, "cams": r_spec}
    opt_spec = optax.ScaleByAdamState(
        count=r_spec, mu=param_spec, nu=param_spec
    )

    @partial(jax.jit, static_argnames=("intr", "pcfg", "rcfg"))
    def sharded_run_schedule(
        grids, decoders, cam_tensors, grid_masks, bounds, scene_bound,
        intr, colors, depths, frame_valid, cam_fixed, key, sched,
        opt_state, pcfg, rcfg,
    ):
        assert pcfg.n_pixels % mesh.shape[KF_AXIS] == 0, (
            "mapping pixel budget must divide the kf mesh axis"
        )
        for lvl, g in grids.items():
            assert g.shape[0] % mesh.shape[MAP_AXIS] == 0, (
                f"grid {lvl} Z={g.shape[0]} not divisible by map axis "
                f"{mesh.shape[MAP_AXIS]}; pad with pad_grid_for_sharding"
            )
        body = shard_map(
            partial(_body, intr=intr, pcfg=pcfg, rcfg=rcfg),
            mesh=mesh,
            in_specs=(
                g_spec,  # grids (dict prefix)
                r_spec,  # decoders
                r_spec,  # cams
                g_spec,  # frustum masks
                r_spec,  # bounds
                r_spec,  # scene_bound
                r_spec,  # colors
                r_spec,  # depths
                r_spec,  # valid
                r_spec,  # fixed
                r_spec,  # key
                r_spec,  # schedule
                opt_spec,  # adam moments mirror the param sharding
            ),
            out_specs=(g_spec, r_spec, r_spec, opt_spec, r_spec),
            check_vma=False,
        )
        return body(
            grids, decoders, cam_tensors, grid_masks, bounds,
            jnp.asarray(scene_bound), colors, depths, frame_valid,
            cam_fixed, key, sched, opt_state,
        )

    return sharded_run_schedule
