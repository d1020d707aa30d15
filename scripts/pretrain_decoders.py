"""Pretrain the decoder hierarchy with direct analytic supervision.

Upstream NICE-SLAM ships pretrained ConvONet decoders and freezes middle/fine
at SLAM time (reference: src/models/NICE.cpp:8-11, config/nice_slam.yaml:13-15,
51 fix_fine) — the decoders are a GENERIC feature->occupancy/color mapping and
the per-scene grids adapt to it. No upstream checkpoints can be fetched here
(zero egress), so this script trains an equivalent artifact from scratch.

Recipe (v2 — the v1 recipe, joint SLAM-objective training, produced decoders
whose occupancy logits exploded to ~-4500 on fresh grids: sigmoid(10*occ)=0,
grid gradient exactly 0, so SLAM could never write geometry into the map.
An L1 *render* loss constrains alpha, which saturates, not the logit):

- K randomized analytic scenes per bound envelope: a room box (interior =
  free) plus 3 solid obstacle boxes (occupied), sizes/offsets drawn per
  scene so xyz position alone cannot predict occupancy — grid FEATURES must
  carry the geometry, which is exactly what SLAM-time mapping relies on.
- Per-scene grids + shared decoders are optimized jointly against BOUNDED
  occupancy-logit targets  t(p) = tanh(sd_occ(p) / w)  (sd_occ > 0 inside
  the occupied region), per stage: middle, fine (= middle + fine residual),
  coarse (wider transition, matching its 2 m voxels). Bounded targets pin
  the logit scale to the responsive range of the compositor's
  alpha = sigmoid(10*occ) (core/compositing.py:54).
- Color: raw rgb supervised at near-surface points against a per-scene
  random wall palette modulated by the same checkerboard shading the
  synthetic dataset uses (io/datasets/synthetic.py) — raw rgb is composited
  directly, no sigmoid (core/compositing.py:66).
- Fresh-grid calibration: with ZERO grid features (the SLAM start state,
  grids ~ N(0, 0.01)), every stage's occ is pulled to -0.35 — mildly free
  space on the responsive part of the sigmoid, so grid gradients are live
  from the first mapping iteration.
- Small L2 on grids keeps pretrain feature magnitudes in the O(0.1) range
  SLAM-time optimization produces.

    python scripts/pretrain_decoders.py --out models/pretrained_decoders.npz

Use from a config:

    pretrained_decoders:
      middle_fine: models/pretrained_decoders.npz
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_OBS = 3  # obstacles per scene (static count -> one XLA program per bound)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--steps", type=int, default=400, help="opt steps/scene")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--decoders-lr", type=float, default=1e-3)
    ap.add_argument("--grids-lr", type=float, default=1e-2)
    ap.add_argument("--width", type=float, default=0.05,
                    help="occ transition half-width [m] (middle/fine)")
    ap.add_argument("--width-coarse", type=float, default=0.30)
    ap.add_argument("--cal-target", type=float, default=-0.35)
    ap.add_argument("--out", default="models/pretrained_decoders.npz")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jaxcache-tpu",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from niceslam_tpu.grid.hierarchy import GridConfig, init_grids
    from niceslam_tpu.models.decoders import init_decoders, nice_forward
    from niceslam_tpu.models.pretrained import save_decoders_npz

    # Same three coordinate envelopes as the SLAM configs exercise (small
    # room / the bench-scale room / large hall): each distinct bound is a
    # distinct grid shape and therefore a distinct (cheap — supervised-step,
    # not the mapping program) XLA compile.
    BOUND_SET = [
        ((-2.2, 2.2), (-2.2, 2.2), (-2.2, 2.2)),
        ((-4.5, 3.82), (-1.5, 2.02), (-3.0, 2.76)),
        ((-6.0, 5.6), (-2.5, 3.1), (-5.0, 4.6)),
    ]

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    decoders = init_decoders(jax.random.PRNGKey(args.seed + 1))

    dec_tx = optax.adam(args.decoders_lr)
    grid_tx = optax.adam(args.grids_lr)

    def sd_box_outside(p, box):
        """max-norm signed distance: >0 outside the box, <0 inside."""
        q = jnp.maximum(box[:, 0] - p, p - box[:, 1])  # [N, 3]
        return jnp.max(q, axis=-1)

    def sd_occupied(p, room, obs):
        """>0 inside the occupied region (outside room OR inside obstacle)."""
        sd = sd_box_outside(p, room)  # occupied outside the room shell
        for k in range(N_OBS):
            sd = jnp.maximum(sd, -sd_box_outside(p, obs[k]))
        return sd

    def checker_shade(p):
        chk = jnp.mod(jnp.sum(jnp.floor(p / 0.5), axis=-1), 2.0)
        return 0.75 + 0.25 * chk

    def surface_points(k, n, box, jitter):
        """n points near the surface of an axis-aligned box, with the face
        index [0..5] (axis*2 + (0 if min-face else 1)) for color lookup."""
        k1, k2, k3, k4 = jax.random.split(k, 4)
        p = jax.random.uniform(
            k1, (n, 3), minval=box[:, 0], maxval=box[:, 1]
        )
        face = jax.random.randint(k2, (n,), 0, 6)
        axis, side = face // 2, face % 2
        coord = box[axis, side]
        p = p.at[jnp.arange(n), axis].set(coord)
        p = p + jitter * jax.random.normal(k3, (n, 3))
        del k4
        return p, face

    def make_step(bound_idx, grid_bounds):
        """Build the jitted optimization step for one bound envelope."""

        def loss_fn(trainable, geom, k):
            dec, grids = trainable
            room, obs = geom["room"], geom["obs"]
            B = args.batch
            ks = jax.random.split(k, 8)

            # --- point sets -------------------------------------------------
            scene_b = grid_bounds["middle"]  # [3, 2] scene bound
            p_uni = jax.random.uniform(
                ks[0], (B, 3), minval=scene_b[:, 0], maxval=scene_b[:, 1]
            )
            p_room, f_room = surface_points(ks[1], B // 2, room, 0.06)
            n_per = max(B // (2 * N_OBS), 1)
            p_obs_list, c_obs_list = [], []
            for j in range(N_OBS):
                pj, _ = surface_points(
                    jax.random.fold_in(ks[2], j), n_per, obs[j], 0.04
                )
                p_obs_list.append(pj)
                c_obs_list.append(
                    jnp.broadcast_to(geom["obs_color"][j], (n_per, 3))
                )
            p_obs = jnp.concatenate(p_obs_list, 0)
            pts = jnp.concatenate([p_uni, p_room, p_obs], 0)

            # --- occupancy targets -----------------------------------------
            sd = sd_occupied(pts, room, obs)
            t_mf = jnp.tanh(sd / args.width)
            occ_m = nice_forward(dec, grids, pts, grid_bounds, "middle")[:, 3]
            occ_f = nice_forward(dec, grids, pts, grid_bounds, "fine")[:, 3]
            loss_m = jnp.mean(optax.huber_loss(occ_m, t_mf, delta=1.0))
            loss_f = jnp.mean(optax.huber_loss(occ_f, t_mf, delta=1.0))

            # coarse: its own (wide) transition; sample also outside the
            # scene bound into the enlarged coarse bound so the coarse level
            # learns "beyond the room shell = occupied".
            cb = grid_bounds["coarse"]
            p_c = jax.random.uniform(
                ks[3], (B, 3), minval=cb[:, 0], maxval=cb[:, 1]
            )
            t_c = jnp.tanh(sd_occupied(p_c, room, obs) / args.width_coarse)
            occ_c = nice_forward(dec, grids, p_c, grid_bounds, "coarse")[:, 3]
            loss_c = jnp.mean(optax.huber_loss(occ_c, t_c, delta=1.0))

            # --- color at surfaces -----------------------------------------
            p_col = jnp.concatenate([p_room, p_obs], 0)
            c_room = geom["palette"][f_room]  # [B/2, 3]
            c_tgt = (
                jnp.concatenate([c_room, jnp.concatenate(c_obs_list, 0)], 0)
                * checker_shade(p_col)[:, None]
            )
            rgb = nice_forward(dec, grids, p_col, grid_bounds, "color")[:, :3]
            loss_col = jnp.mean(jnp.abs(rgb - c_tgt))

            # --- fresh-grid calibration ------------------------------------
            zg = jax.tree_util.tree_map(jnp.zeros_like, grids)
            p_cal = pts[:: max(len(pts) // 1024, 1)]
            cal = 0.0
            for stage in ("middle", "fine", "coarse"):
                o0 = nice_forward(dec, zg, p_cal, grid_bounds, stage)[:, 3]
                cal = cal + jnp.mean((o0 - args.cal_target) ** 2)

            reg = sum(jnp.mean(g * g) for g in grids.values())
            total = (
                loss_m + loss_f + loss_c + 0.5 * loss_col
                + 0.3 * cal + 1e-2 * reg
            )
            aux = {
                "m": loss_m, "f": loss_f, "c": loss_c,
                "col": loss_col, "cal": cal,
            }
            return total, aux

        @jax.jit
        def step(dec, grids, dec_st, grid_st, geom, k):
            (total, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )((dec, grids), geom, k)
            gdec, ggrid = grads
            du, dec_st = dec_tx.update(gdec, dec_st, dec)
            dec = optax.apply_updates(dec, du)
            gu, grid_st = grid_tx.update(ggrid, grid_st, grids)
            grids = optax.apply_updates(grids, gu)
            return dec, grids, dec_st, grid_st, total, aux

        return step

    t0 = time.perf_counter()
    steps = {}
    final_aux = None
    for s in range(args.scenes):
        bi = s % len(BOUND_SET)
        bound = np.asarray(BOUND_SET[bi], np.float32)
        grids, grid_bounds, adj_bound = init_grids(
            jax.random.PRNGKey(args.seed + 100 + s), bound, GridConfig()
        )
        if bi not in steps:
            steps[bi] = make_step(bi, grid_bounds)
        step = steps[bi]

        # randomized geometry: room = shrunk/offset bound; obstacles inside
        ext = adj_bound[:, 1] - adj_bound[:, 0]
        shrink = rng.uniform(0.72, 0.95, 3)
        room_ext = ext * shrink
        slack = ext - room_ext
        room_min = adj_bound[:, 0] + rng.uniform(0, 1, 3) * slack
        room = np.stack([room_min, room_min + room_ext], -1)
        obs = []
        for _ in range(N_OBS):
            oe = room_ext * rng.uniform(0.08, 0.3, 3)
            omin = room_min + rng.uniform(0.05, 0.9, 3) * (room_ext - oe)
            obs.append(np.stack([omin, omin + oe], -1))
        geom = {
            "room": jnp.asarray(room, jnp.float32),
            "obs": jnp.asarray(np.stack(obs), jnp.float32),
            "palette": jnp.asarray(
                rng.uniform(0.15, 0.95, (6, 3)), jnp.float32
            ),
            "obs_color": jnp.asarray(
                rng.uniform(0.15, 0.95, (N_OBS, 3)), jnp.float32
            ),
        }

        dec_st = dec_tx.init(decoders)
        grid_st = grid_tx.init(grids)
        for it in range(args.steps):
            key, k = jax.random.split(key)
            decoders, grids, dec_st, grid_st, total, aux = step(
                decoders, grids, dec_st, grid_st, geom, k
            )
        total = float(total)
        final_aux = {k_: round(float(v), 4) for k_, v in aux.items()}
        assert np.isfinite(total), f"scene {s} diverged"
        print(
            f"scene {s} (bound {bi}): loss={total:.4f} {final_aux}",
            file=sys.stderr, flush=True,
        )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_decoders_npz(args.out, decoders)
    print(json.dumps({
        "scenes": args.scenes,
        "steps_per_scene": args.steps,
        "final_losses": final_aux,
        "wall_s": round(time.perf_counter() - t0, 1),
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
