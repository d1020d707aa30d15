"""NiceSLAM system driver: the per-frame track/map loop.

The reference's driver is *implied, not written* — main() calls a
Tracker::run overload that does not exist and never invokes the Mapper
(reference: src/main.cpp:96, SURVEY.md §2.9.1-2). This module supplies the
upstream-intent loop:

    frame 0:     mapper initialization (iters_first, lr_first_factor)
    every frame: track (warm-started by the constant-speed model)
    every `every_frame`-th frame: coarse mapper pass, then staged mapping
    final frame: color-refinement pass (window x2, all-color stages)

Sync semantics: the upstream two-process "strict" handshake collapses to a
sequential publish — the tracker always sees the mapper's latest published
``MapState`` snapshot (a versioned immutable pytree), which is exactly what
strict-mode lockstep guarantees (SURVEY.md §5 "Race detection"). The
multi-chip variant (parallel/) shards the mapping step over a device mesh
without changing this driver contract.
"""
from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import SLAMConfig
from ..core.pose import constant_speed_warm_start, tensor_from_camera
from ..core.rays import Intrinsics
from ..grid.hierarchy import GridConfig
from ..io.datasets.base import Frame, FrameReader, get_dataset
from ..models.decoders import DecoderConfig
from ..render.renderer import RenderConfig
from ..utils.logging import MetricsLogger
from ..utils.profiling import StepTimer, annotate
from . import keyframes as kf_mod
from .mapper import (
    MapOptConfig,
    ProgConfig,
    Schedule,  # noqa: F401 — part of the driver's public re-export surface
    build_stage_plan,
    chunked_schedule,
    init_opt_state,
    run_schedule,
)
from .state import MapState, add_keyframe, init_state
from .tracker import TrackConfig, track_frame


class NiceSLAM:
    """Single-host SLAM engine over an RGB-D frame stream."""

    def __init__(
        self,
        cfg: SLAMConfig,
        reader: Optional[FrameReader] = None,
        log_path: Optional[str] = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.seed = seed
        self.reader = reader if reader is not None else get_dataset(cfg)
        c = cfg.cam
        self.intr = Intrinsics(
            H=c.H - 2 * c.crop_edge,
            W=c.W - 2 * c.crop_edge,
            fx=c.fx,
            fy=c.fy,
            cx=c.cx - c.crop_edge,
            cy=c.cy - c.crop_edge,
        )
        self.key = jax.random.PRNGKey(seed)
        gl = cfg.grid_len
        grid_cfg = GridConfig(
            coarse_len=gl.coarse,
            middle_len=gl.middle,
            fine_len=gl.fine,
            color_len=gl.color,
            bound_divisable=gl.bound_divisable,
            c_dim=cfg.model.c_dim,
            coarse_bound_enlarge=cfg.model.coarse_bound_enlarge,
        )
        dec_cfg = DecoderConfig(
            c_dim=cfg.model.c_dim, hidden=cfg.model.hidden_size,
            coarse=cfg.coarse,
        )
        self.state, self.bounds, bound = init_state(
            self._next_key(),
            np.asarray(cfg.bound, np.float32) * cfg.scale,
            self.intr.H,
            self.intr.W,
            grid_cfg,
            dec_cfg,
            kf_capacity=cfg.mapping.max_keyframes,
        )
        self.scene_bound = jnp.asarray(bound)
        # Commit the initial world to device 0 so the very first mapping
        # event already runs the same (committed) program signature the
        # steady state uses (see _commit).
        self.state, self.bounds, self.scene_bound = self._commit(
            (self.state, self.bounds, self.scene_bound)
        )
        # Pretrained decoder import (upstream loads traced pretrained
        # decoders and freezes middle/fine — reference src/models/NICE.cpp:
        # 8-11, config/nice_slam.yaml:13-15,51). Without checkpoints the
        # decoders must train in-loop or map quality is capped by a frozen
        # random function (VERDICT r1 missing #1).
        if cfg.pretrained_coarse or cfg.pretrained_middle_fine:
            from ..models.pretrained import load_pretrained_decoders

            self.state = self.state._replace(
                decoders=load_pretrained_decoders(
                    self.state.decoders,
                    cfg.pretrained_coarse,
                    cfg.pretrained_middle_fine,
                )
            )
        # Decoder training policy: pretrained -> frozen (upstream fix_fine
        # semantics, config/nice_slam.yaml:51); otherwise per
        # mapping.decoder_train ('never'/'init'/'always').
        self.decoder_train = (
            "never" if cfg.pretrained_middle_fine
            else cfg.mapping.decoder_train
        )
        self.rcfg = RenderConfig(
            n_samples=cfg.rendering.N_samples,
            n_surface=cfg.rendering.N_surface,
            n_importance=cfg.rendering.N_importance,
            perturb=cfg.rendering.perturb,
            lindisp=cfg.rendering.lindisp,
            occupancy=cfg.occupancy,
            surface_band=cfg.rendering.surface_band,
        )
        t = cfg.tracking
        self.tcfg = TrackConfig(
            pixels=t.pixels,
            iters=t.iters,
            lr=t.lr,
            separate_LR=t.seperate_LR,
            use_color=t.use_color_in_tracking,
            w_color_loss=t.w_color_loss,
            handle_dynamic=t.handle_dynamic,
            depth_err_gate=t.depth_err_gate,
            method=t.method,
            gn_prior_sigma_r=t.gn_prior_sigma_r,
            gn_prior_sigma_t=t.gn_prior_sigma_t,
            gn_step_clip=t.gn_step_clip,
            gn_depth_offset_sigma=t.gn_depth_offset_sigma,
            ignore_edge_H=t.ignore_edge_H,
            ignore_edge_W=t.ignore_edge_W,
        )
        # Observed-voxel locking (mapping.lock_after): per-level float
        # event counts [Z, Y, X, 1]; a voxel with count >= lock_after stops
        # receiving grid updates (gauge-pinning — schema rationale). Device-
        # resident; incremented once per mapping event with that event's
        # frustum mask. Not persisted by checkpoints: a restore unlocks the
        # map once (counts restart at zero), which only softens the pin.
        self._obs_counts = (
            {
                lvl: jnp.zeros(g.shape[:3] + (1,), g.dtype)
                for lvl, g in self.state.grids.items()
            }
            if cfg.mapping.lock_after > 0
            else None
        )
        self.est_c2w: List[np.ndarray] = []
        self.gt_c2w: List[Optional[np.ndarray]] = []
        self.track_losses: List[float] = []
        self.log = MetricsLogger(log_path, verbose=cfg.verbose)
        # Wall-clock section accounting (SURVEY.md §5 tracing/profiling);
        # dispatch-time only in async mode (no forced device syncs).
        self.timer = StepTimer()
        self.n_imgs = len(self.reader)
        # mapping-step function override hook (parallel/ injects the
        # Z-sharded version; same signature as mapper.run_schedule).
        self.run_schedule_fn = run_schedule
        # optional visual dumps (utils/visualizer.py) every mapping.vis_freq
        self.vis_dir: Optional[str] = None
        # test-only fault injection (SURVEY.md §5 "fault injection as a
        # test-only hook"): called with (frame_idx, mapper outputs), may
        # corrupt/delay them; the publish guard below must contain the fault.
        self.fault_hook = None
        # sync_method (config/nice_slam.yaml:2): "strict" blocks the host on
        # every mapping event (lockstep publish + NaN guard); "async" is the
        # upstream two-process semantics rebuilt on JAX's async dispatch —
        # the host never waits on device results in the frame loop, the NaN
        # guard is verified one event later (with state rollback), and loss
        # curves materialize at flush()/result().
        self.sync_method = cfg.sync_method
        # PP role split (parallel.track_role, SURVEY.md §2.2 PP row): the
        # tracker's program runs on the last visible device, disjoint from
        # the staged mapper on device 0. The tracker pins a map snapshot per
        # published version — one async D2D copy per mapping event.
        # (state.version, (decoders, grids, bounds, scene_bound)) on the
        # tracker device; invalidated on rollback/restore.
        self._track_snap_cache = None
        self._pending_verify = None  # (idx, coarse, stages, losses, prev)
        self._track_loss_dev: List = []  # deferred device loss curves
        # Host mirrors of keyframe-DB bookkeeping so the async frame loop
        # never forces a device sync for control flow.
        self._kf_count = 0
        self._kf_slot_frame = np.full(
            (cfg.mapping.max_keyframes,), -1, np.int64
        )
        # Keyframe-overlap percentages for the NEXT event's selection,
        # dispatched (async) at the end of each mapping event so reading
        # them never blocks the frame loop (_window_slots).
        self._overlap_pct = None

    # ------------------------------------------------------------------ util
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    @staticmethod
    def _commit(tree, device=None):
        """Pin every leaf as COMMITTED to ``device`` (default device 0).

        jit's executable cache keys on input committedness (an uncommitted
        array and the same array committed to device 0 are DIFFERENT cache
        entries), so precompile() warming uncommitted dummies while the live
        loop calls with device_put frames compiled the big mapping program
        twice — a 100-200 s first-encounter stall at the first real mapping
        event on a tunneled chip. Committing everything at every hot call
        site makes the signature unconditional. device_put of an array
        already on the target device is transfer-free.
        """
        if device is None:
            device = jax.devices()[0]
        return jax.device_put(tree, device)

    def _published(self):
        """Map snapshot the tracker pins for this frame (strict sync)."""
        return self.state

    def _track_device(self):
        """Device the tracker role is pinned to (None = share device 0).

        Active only with >=2 devices and no ('map','kf') mesh attached (a
        mesh owns every device; the sharded mapping program and a pinned
        tracker would fight over placement).
        """
        if not self.cfg.parallel.track_role:
            return None
        if getattr(self, "_runtime", None) is not None:
            return None
        devs = jax.devices()
        return devs[-1] if len(devs) > 1 else None

    def _track_snapshot(self, snap, device):
        """The published map, resident on the tracker's device.

        Cached per published version: the D2D copy (grids + decoders,
        ~13 MB) happens once per mapping event, dispatched asynchronously.
        """
        cache = self._track_snap_cache
        if cache is None or cache[0] != snap.version:
            # bounds/scene_bound were committed to device 0 at init; the
            # tracker-device executable needs EVERY array argument committed
            # to its device or jit raises an incompatible-devices error.
            moved = jax.device_put(
                (snap.decoders, snap.grids, self.bounds, self.scene_bound),
                device,
            )
            self._track_snap_cache = (snap.version, moved)
        return self._track_snap_cache[1]

    # -------------------------------------------------------------- tracking
    def track(self, frame: Frame) -> np.ndarray:
        cfgt = self.cfg.tracking
        idx = len(self.est_c2w)
        gt = frame.gt_c2w if frame.gt_c2w is not None else np.eye(4, dtype=np.float32)
        if idx == 0 or cfgt.gt_camera:
            c2w = np.asarray(gt, np.float32)
            losses = []
        else:
            # Warm start stays on device: no host sync before the track
            # dispatch (the motion-model extrapolation is a tiny async op).
            prev = jnp.asarray(self.est_c2w[-1])
            if cfgt.const_speed_assumption and idx >= 2:
                init = constant_speed_warm_start(
                    prev, jnp.asarray(self.est_c2w[-2])
                )
            else:
                init = prev
            snap = self._published()
            decs, grds = snap.decoders, snap.grids
            bnds, sbound = self.bounds, self.scene_bound
            color_j, depth_j = jnp.asarray(frame.color), jnp.asarray(frame.depth)
            key = self._next_key()
            td = self._track_device()
            if td is not None:
                # PP role split: run this frame's whole tracking program on
                # the tracker device; only the 4x4 pose returns to device 0.
                decs, grds, bnds, sbound = self._track_snapshot(snap, td)
            color_j, depth_j, init, key = self._commit(
                (color_j, depth_j, init, key), td
            )
            c2w_j, loss_curve = track_frame(
                decs,
                grds,
                bnds,
                sbound,
                self.intr,
                color_j,
                depth_j,
                init,
                key,
                self.tcfg,
                self.rcfg,
            )
            if td is not None:
                c2w_j = jax.device_put(c2w_j, jax.devices()[0])
            if self.sync_method == "async":
                # Free-running: the pose stays a device array (a future);
                # every consumer (warm start, window assembly, keyframes) is
                # a device op, so the host never blocks here.
                self.est_c2w.append(c2w_j)
                self.gt_c2w.append(
                    None if frame.gt_c2w is None else np.asarray(frame.gt_c2w)
                )
                self._track_loss_dev.append(loss_curve)
                return c2w_j
            # One host round trip for both results.
            c2w, loss_np = jax.device_get((c2w_j, loss_curve))
            c2w = np.asarray(c2w)
            losses = [float(x) for x in loss_np]
        self.est_c2w.append(np.asarray(c2w, np.float32))
        self.gt_c2w.append(
            None if frame.gt_c2w is None else np.asarray(frame.gt_c2w)
        )
        if losses:
            self.track_losses.append(losses[-1])
        return c2w

    # --------------------------------------------------------------- mapping
    def _window_slots(self, idx: int, coarse: bool, salt: int = 0):
        """Pick keyframe slots for the optimization window (host-side).

        Mirrors upstream: (window-2) overlap/global-selected keyframes
        + the most recent keyframe + the current frame. ``salt``
        distinguishes the refine pass's repeated re-selections at one frame
        (src/Mapper.cpp:526-528: fresh selection per outer pass).
        """
        db = self.state.keyframes
        count = self._kf_count  # host mirror: no device sync for control flow
        wsize = self.cfg.mapping.mapping_window_size
        n_sel = wsize - 2
        slots: List[int] = []
        if count > 0:
            last = (count - 1) % db.capacity
            prev_slots = [s % db.capacity for s in range(max(0, count - db.capacity), count - 1)]
            if prev_slots and n_sel > 0:
                method = (
                    "global" if coarse else self.cfg.mapping.keyframe_selection_method
                )
                # Selection randomness derives from the system seed so runs
                # are reproducible per (seed, frame) and independent of call
                # order (VERDICT r1 weak #7).
                rng = np.random.default_rng((self.seed, idx, salt))
                if method == "global":
                    pick = rng.permutation(prev_slots)[:n_sel]
                    slots = [int(s) for s in pick]
                else:
                    # Deferred overlap selection (r2/r3 weak, VERDICT r3 ask
                    # #7): the percentages were DISPATCHED at the end of the
                    # previous mapping event (_dispatch_overlap_pct), so the
                    # np.asarray below reads an already-settled device result
                    # — the free-running async host no longer serializes
                    # against device 0 once per event. The first overlap
                    # event (nothing dispatched yet) falls back to global
                    # selection, exactly what upstream does before any
                    # overlap data exists.
                    if self._overlap_pct is not None:
                        p = np.asarray(self._overlap_pct)
                        cand = [s for s in prev_slots if p[s] > 0]
                    else:
                        cand = prev_slots
                    slots = [int(s) for s in rng.permutation(cand)[:n_sel]]
            slots = slots + [last]
        return slots, wsize

    def map_frame(self, frame: Frame, first: bool = False):
        """One mapping event: optional coarse pass + staged fine mapping."""
        m = self.cfg.mapping
        idx = len(self.est_c2w) - 1
        self._cur_color, self._cur_depth = frame.color, frame.depth
        cur_c2w = self.est_c2w[-1]

        is_last = idx == self.n_imgs - 1
        # Final-frame color refine runs FIVE outer passes of the normal
        # per-pass budget (num_joint_iters*5 split over outer_joint_iters=5)
        # with a FRESH keyframe selection per pass
        # (reference src/Mapper.cpp:507-513, 526-528).
        outer = 1
        if first:
            mode, iters, lr_factor = "init", m.iters_first, m.lr_first_factor
        elif is_last and m.color_refine:
            mode, iters, lr_factor = "refine", m.iters, m.lr_factor
            outer = 5
        else:
            mode, iters, lr_factor = "normal", m.iters, m.lr_factor
            if idx < m.bootstrap_frames and m.bootstrap_iters > 0:
                # Bootstrap events may run a deeper budget (chunks of the
                # same compiled program — no new signature).
                iters = m.bootstrap_iters
        # Async mode: settle the previous event's deferred NaN guard before
        # this event builds on the published state, then snapshot the
        # pre-event state so the WHOLE event (coarse + staged passes, BA pose
        # write-backs, keyframe admission) can be rolled back as a unit if
        # any pass diverges. The snapshot must include the keyframe DB and
        # the trajectory tail: under BA a diverged pass writes possibly-NaN
        # poses into keyframes.est_c2w and est_c2w[-1] (ADVICE r1 high #2).
        self._verify_pending()
        self._event_prev = (
            self.state,  # immutable pytree: snapshot = reference, free
            self._kf_count,
            self._kf_slot_frame.copy(),
            len(self.est_c2w) - 1,
            self.est_c2w[-1],
            self._obs_counts,  # immutable dict-of-arrays (or None)
        )
        self._event_passes = []
        # Decoder training window (mapping.decoder_train): 'init' trains the
        # decoders only during the first-frame init pass (a per-scene fit —
        # afterwards the geometry basis is frozen and only grids adapt).
        self._train_decoders_now = (
            self.decoder_train == "always"
            or (self.decoder_train == "init" and first)
        )
        # Stage-expert placement (parallel.stage_ep, SURVEY.md §2.2 EP/PP):
        # the coarse pass touches ONLY the coarse grid/decoder — disjoint
        # from the staged pass's middle/fine/color — so on a multi-device
        # host it runs on device 1 while the staged pass runs on device 0,
        # both dispatched asynchronously (true role concurrency; exact by
        # parameter disjointness).
        # stage_ep is undefined combined with a non-trivial ('map','kf')
        # mesh (the sharded program is mesh-bound; device_put onto a single
        # expert device would fight it AND steal a mesh device) — skip it
        # when the sharded runtime is attached (r2 ADVICE low #2).
        ep_dev = None
        if (
            self.cfg.parallel.stage_ep
            and getattr(self, "_runtime", None) is None
        ):
            devs = jax.devices()
            if len(devs) > 1:
                ep_dev = devs[1]
        self._ep_pending = None
        if self.cfg.coarse and not first:
            self._run_mapper(
                frame, cur_c2w, m.iters, lr_factor, coarse=True,
                refine=False, device=ep_dev,
            )
        for outer_i in range(outer):
            cur_c2w = self._run_mapper(
                frame, cur_c2w, iters, lr_factor,
                coarse=False, refine=(mode == "refine"), sel_salt=outer_i,
            )
        if self._ep_pending is not None:
            # stage-EP merge: pull the coarse expert's outputs (device 1)
            # back next to the staged results (device 0) — an async D2D
            # copy; nothing on the hot path waited for it. In sync mode the
            # coarse NaN guard runs HERE, after the staged pass was
            # dispatched, so devices 0 and 1 actually overlapped.
            g_c, d_c, ep_losses, ep_idx = self._ep_pending
            accept = True
            if self.sync_method != "async":
                losses_np = np.asarray(ep_losses)
                if not np.isfinite(losses_np[-1]):
                    accept = False
                    self.log.log(
                        {
                            "event": "map_rejected", "frame": ep_idx,
                            "coarse": True,
                            "loss_last": float(losses_np[-1]),
                        }
                    )
            if accept:
                dev0 = jax.devices()[0]
                self.state = self.state._replace(
                    grids={
                        **self.state.grids,
                        "coarse": jax.device_put(g_c, dev0),
                    },
                    decoders={
                        **self.state.decoders,
                        "coarse": jax.device_put(d_c, dev0),
                    },
                )
            self._ep_pending = None
        self.est_c2w[-1] = (
            cur_c2w
            if self.sync_method == "async"
            else np.asarray(cur_c2w, np.float32)
        )
        if self.sync_method == "async" and self._event_passes:
            self._pending_verify = (self._event_prev, self._event_passes)
            self._event_passes = []

        if self._obs_counts is not None and getattr(self, "_event_frustum", None) is not None:
            self._obs_counts = {
                lvl: self._obs_counts[lvl] + self._event_frustum[lvl]
                for lvl in self._obs_counts
            }
            self._event_frustum = None

        # Re-track against the just-updated map (mapping.retrack): the event
        # frame's pose was solved against the PREVIOUS map state; re-solving
        # it here, before keyframe admission, stores a pose consistent with
        # the map it anchors — breaking the drift-bake-in feedback loop
        # (config/schema.py retrack rationale; measured r5).
        if m.retrack and not first and not self.cfg.tracking.gt_camera:
            self._retrack_event_frame(frame)

        # Keyframe admission (src/Mapper.cpp:537-550 / upstream).
        # Bootstrap frames are all keyframed: until the second regular
        # keyframe exists the window would otherwise hold only {kf0, cur},
        # so views between events are forgotten and the early map degrades
        # with distance from frame 0 (see bootstrap_frames).
        if (
            idx % m.keyframe_every == 0
            or idx < m.bootstrap_frames
            or idx == self.n_imgs - 2
        ) and not self._is_keyframe(idx):
            gt = self.gt_c2w[-1]
            self.state = self.state._replace(
                keyframes=add_keyframe(
                    self.state.keyframes,
                    jnp.asarray(frame.color),
                    jnp.asarray(frame.depth),
                    jnp.asarray(self.est_c2w[-1]),
                    jnp.asarray(gt if gt is not None else np.eye(4, dtype=np.float32)),
                    idx,
                )
            )
            slot = self._kf_count % self.state.keyframes.capacity
            self._kf_slot_frame[slot] = idx
            self._kf_count += 1
        self.state = self.state._replace(version=self.state.version + 1)
        # Dispatch the overlap percentages the NEXT event's keyframe
        # selection will read (deferred one event, like the NaN guard) —
        # a ~0.5 ms async program; by the next event it has long settled,
        # so _window_slots never blocks the host on device 0.
        if (
            self.cfg.mapping.keyframe_selection_method == "overlap"
            and self._kf_count > 1
        ):
            key_o, c2w_o, depth_o, color_o, kf_o = self._commit(
                (
                    self._next_key(),
                    jnp.asarray(self.est_c2w[-1]),
                    jnp.asarray(self._cur_depth),
                    jnp.asarray(self._cur_color),
                    self.state.keyframes.est_c2w,
                )
            )
            self._overlap_pct = kf_mod.keyframe_overlap_percentages(
                key_o, self.intr, c2w_o, depth_o, color_o, kf_o
            )

    def _retrack_event_frame(self, frame: Frame):
        """One extra pose solve for the event frame on the fresh map.

        Runs on device 0 (the map is resident there post-event; in PP
        track-role mode this is a second tracker executable, warmed like
        any other signature on first use). Async mode keeps the pose a
        device future like track() does; a diverged event produces a
        non-finite pose here, which the deferred rollback's trajectory
        scrub already contains (_verify_pending).
        """
        color_j, depth_j, init, key = self._commit(
            (
                jnp.asarray(frame.color),
                jnp.asarray(frame.depth),
                jnp.asarray(self.est_c2w[-1]),
                self._next_key(),
            )
        )
        snap = self._published()
        c2w_j, _ = track_frame(
            snap.decoders, snap.grids, self.bounds, self.scene_bound,
            self.intr, color_j, depth_j, init, key, self.tcfg, self.rcfg,
        )
        self.est_c2w[-1] = (
            c2w_j
            if self.sync_method == "async"
            else np.asarray(jax.device_get(c2w_j), np.float32)
        )

    def _is_keyframe(self, idx: int) -> bool:
        return bool(np.any(self._kf_slot_frame == idx))

    def _make_mcfg(self, ba: bool, refine: bool, lr_factor) -> MapOptConfig:
        """Static mapper config for one pass — single source for the live
        mapping path AND precompile(), so warmed signatures always match."""
        m = self.cfg.mapping
        return MapOptConfig(
            pixels=m.pixels,
            w_color_loss=m.w_color_loss,
            BA=ba,
            BA_cam_lr=m.BA_cam_lr,
            fix_fine=m.fix_fine,
            fix_color=m.fix_color or refine,
            frustum_feature_selection=m.frustum_feature_selection and not refine,
            lr_factor=float(lr_factor),
            # refine is a color-only pass upstream: geometry decoders stay put
            train_all_decoders=getattr(self, "_train_decoders_now", False)
            and not refine,
            decoders_lr_fallback=m.decoders_lr,
        )

    def _make_pcfg(self, mcfg: MapOptConfig) -> ProgConfig:
        """Static program config of one pass.

        ``ba`` keys on the PER-PASS gate (mcfg.BA), not the config flag: a
        BA-off pass then compiles without the camera gradient chain in any
        branch (the chain costs ~30% of the staged-pass time, and BA only
        activates once >4 keyframes exist). The one extra signature this
        introduces (ba flips False->True mid-run) is warmed by precompile()
        alongside the others, so the flip never stalls the loop."""
        from .mapper import dec_train_table

        m = self.cfg.mapping
        return ProgConfig(
            n_pixels=m.pixels,
            w_color_loss=mcfg.w_color_loss,
            frustum=mcfg.frustum_feature_selection,
            ba=mcfg.BA,
            dec_train=dec_train_table(m.stage_lr, mcfg),
            tv_weight=m.tv_weight,
            fs_weight=m.fs_weight,
            fs_band=m.fs_band,
        )

    def _make_plan(self, iters: int, coarse: bool, refine: bool):
        m = self.cfg.mapping
        return build_stage_plan(
            iters,
            0.0 if refine else m.middle_iter_ratio,
            0.0 if refine else m.fine_iter_ratio,
            m.stage_lr,
            coarse=coarse,
        )

    def _run_mapper(
        self, frame: Frame, cur_c2w, iters, lr_factor, coarse: bool,
        refine: bool, device=None, sel_salt: int = 0,
    ):
        m = self.cfg.mapping
        db = self.state.keyframes
        idx = len(self.est_c2w) - 1
        slots, wsize = self._window_slots(idx, coarse, salt=sel_salt)
        if refine:
            wsize *= 2
            # refine mode widens the window with more keyframes
            count = self._kf_count
            extra = [
                s % db.capacity
                for s in range(max(0, count - db.capacity), count)
            ]
            for s in extra:
                if s not in slots and len(slots) < wsize - 1:
                    slots.append(s)
        # ONE static compile signature: every call (init included — its
        # window is simply all-invalid except the current frame) uses the
        # full window size with empty slots padded + masked. The mapper
        # assigns rays to valid window frames on-device (mapper.
        # mapping_loss), so one compiled program serves every window
        # occupancy. Window assembly is all device-side gathers from the
        # keyframe DB — the images never round-trip to host.
        F = wsize
        wcur = len(slots)  # current frame occupies the slot after the KFs

        sel = np.zeros((F,), np.int32)
        sel[:wcur] = slots
        sel_j = jnp.asarray(sel)
        cur_color = jnp.asarray(frame.color)
        cur_depth = jnp.asarray(frame.depth)
        cur_pose = jnp.asarray(cur_c2w)
        colors = db.colors[sel_j].at[wcur].set(cur_color)
        depths = db.depths[sel_j].at[wcur].set(cur_depth)
        poses44 = db.est_c2w[sel_j].at[wcur].set(cur_pose)
        cams = jax.vmap(tensor_from_camera)(poses44)

        valid = np.zeros((F,), bool)
        valid[: wcur + 1] = True
        fixed = np.ones((F,), bool)
        frame_indices = self._kf_slot_frame
        oldest = None
        for w, s in enumerate(slots):
            if oldest is None or frame_indices[s] < frame_indices[slots[oldest]]:
                oldest = w

        # BA gate per src/Mapper.cpp:519 — >4 keyframes, enabled, not the
        # coarse mapper. The refine outer passes keep BA live too (:519 is
        # re-evaluated inside the refine loop; pose write-back :521-522).
        ba = m.BA and self._kf_count > m.BA_min_keyframes and not coarse
        if ba:
            fixed[:] = ~valid
            if oldest is not None:
                fixed[oldest] = True  # pin the oldest keyframe (anti-drift)

        mcfg = self._make_mcfg(ba, refine, lr_factor)
        plan = self._make_plan(iters, coarse, refine)
        if mcfg.frustum_feature_selection:
            masks = kf_mod.frustum_masks_for_levels(
                poses44,
                jnp.asarray(valid),
                depths,
                self.intr,
                self.bounds,
                self.state.grids,
            )
        else:
            masks = {
                lvl: jnp.ones(g.shape[:3] + (1,), g.dtype)
                for lvl, g in self.state.grids.items()
            }
        if self._obs_counts is not None:
            # Observed-voxel locking: settled voxels drop out of the update
            # mask (counts are incremented per EVENT in map_frame, from the
            # staged pass's raw frustum mask saved here).
            if not coarse:
                self._event_frustum = masks
            lock = float(self.cfg.mapping.lock_after)
            masks = {
                lvl: m * (self._obs_counts[lvl] < lock).astype(m.dtype)
                for lvl, m in masks.items()
            }

        # Chunked execution through THE hot program (mapper.run_schedule):
        # a normal pass is one chunk; the 1500-iter init pass chains 25
        # chunks of the same compiled signature, threading the Adam state —
        # so no pass ever compiles a second mapping program (VERDICT r1
        # weak #4: 233 s first-encounter stalls are now structural
        # impossibilities for same-F passes).
        pcfg = self._make_pcfg(mcfg)
        n_total = sum(n for _, n, _ in plan)
        ch = min(m.iters, n_total)
        # Device-resident pre-padded chunks, cached per (plan, mcfg, ch):
        # identical events share them, so an event costs zero schedule
        # dispatches (the rebuild was ~a dozen tiny device ops per event —
        # pure latency on a remote-tunneled chip).
        sched_chunks, sched_reals = chunked_schedule(plan, mcfg, ch)
        grids, decoders = self.state.grids, self.state.decoders
        key = self._next_key()
        valid_j, fixed_j = jnp.asarray(valid), jnp.asarray(fixed)
        bounds, scene_bound = self.bounds, self.scene_bound
        if getattr(self, "_runtime", None) is None:
            # Uniform committedness (see _commit): every input of the hot
            # program pinned to the pass device — dev 0, or the stage-EP
            # expert device. Mesh-attached runs keep their NamedShardings.
            (grids, decoders, masks, cams, colors, depths, key, valid_j,
             fixed_j, bounds, scene_bound, sched_chunks) = self._commit(
                (grids, decoders, masks, cams, colors, depths, key, valid_j,
                 fixed_j, bounds, scene_bound, sched_chunks),
                device,
            )
        new_cams = cams
        opt_state = init_opt_state(
            {"grids": grids, "decoders": decoders, "cams": cams}
        )
        if getattr(self, "_runtime", None) is None:
            # zeros_like yields uncommitted moments; chunk 2 of a chained
            # pass would otherwise see a different input signature than
            # chunk 1 (committed outputs thread back in).
            opt_state = self._commit(opt_state, device)
        losses_parts = []
        for chunk, real in zip(sched_chunks, sched_reals):
            grids, decoders, new_cams, opt_state, lo = self.run_schedule_fn(
                grids, decoders, new_cams, masks, bounds,
                scene_bound, self.intr, colors, depths,
                valid_j, fixed_j, key, chunk, opt_state, pcfg, self.rcfg,
            )
            losses_parts.append(lo[:real])
        losses = (
            jnp.concatenate(losses_parts)
            if len(losses_parts) > 1
            else losses_parts[0]
        )
        if self.fault_hook is not None:
            grids, decoders, new_cams, losses = self.fault_hook(
                idx, (grids, decoders, new_cams, losses)
            )
        if device is not None and coarse:
            # stage-EP: publish nothing yet — the staged pass runs from the
            # pre-coarse state on device 0 (it never reads the coarse level)
            # while this expert's outputs settle on device 1; map_frame
            # merges the coarse level back after the staged pass, so the
            # two passes genuinely overlap. The sync-mode NaN check is also
            # DEFERRED to the merge point: blocking on the coarse losses
            # here would serialize device 1 against device 0 and erase the
            # claimed concurrency (r2 ADVICE low #3).
            self._ep_pending = (grids["coarse"], decoders["coarse"], losses, idx)
            if self.sync_method == "async":
                self._event_passes.append(
                    (idx, coarse, [p[0] for p in plan], losses)
                )
            return cur_c2w if self.sync_method == "async" else np.asarray(cur_c2w)
        # Failure detection (SURVEY.md §5): a diverged/corrupted mapping step
        # (NaN/inf loss — e.g. a faulted host in a psum ring) must not
        # survive in the published map. strict: checked (blocking) before
        # publish. async: published optimistically, checked at the next
        # event / flush with rollback to the pre-event snapshot.
        if self.sync_method == "async":
            self.state = self.state._replace(grids=grids, decoders=decoders)
            self._event_passes.append(
                (idx, coarse, [p[0] for p in plan], losses)
            )
        else:
            losses_np = np.asarray(losses)
            if not np.isfinite(losses_np[-1]):
                self.log.log(
                    {
                        "event": "map_rejected",
                        "frame": idx,
                        "coarse": coarse,
                        "loss_last": float(losses_np[-1]),
                    }
                )
                return np.asarray(cur_c2w)
            self.state = self.state._replace(grids=grids, decoders=decoders)
            self.log.log(
                {
                    "event": "map",
                    "frame": idx,
                    "coarse": coarse,
                    "stages": [p[0] for p in plan],
                    "loss_first": float(losses_np[0]),
                    "loss_last": float(losses_np[-1]),
                }
            )

        from ..core.pose import camera_from_tensor, to_homogeneous

        if ba:
            # write optimized keyframe poses back (src/Mapper.cpp:467-489)
            new_poses = to_homogeneous(camera_from_tensor(new_cams))
            if self.sync_method != "async":
                new_poses = np.asarray(new_poses)
            kf_poses = self.state.keyframes.est_c2w
            for w, s in enumerate(slots):
                if not fixed[w]:
                    kf_poses = kf_poses.at[s].set(jnp.asarray(new_poses[w]))
            self.state = self.state._replace(
                keyframes=self.state.keyframes._replace(est_c2w=kf_poses)
            )
            if not fixed[wcur]:
                return new_poses[wcur]
        if self.sync_method == "async":
            return cur_c2w
        return np.asarray(cur_c2w)

    def _verify_pending(self):
        """Resolve the deferred NaN guard of the last async mapping event.

        The whole event (coarse + staged passes, BA pose write-backs and the
        keyframe admitted on top of them) rolls back to its pre-event
        snapshot if ANY pass diverged — passes within one event build on
        each other, so partial acceptance would keep poisoned state.
        """
        if self._pending_verify is None:
            return
        prev, passes = self._pending_verify
        self._pending_verify = None
        tails = [np.asarray(losses)[-1] for _, _, _, losses in passes]
        if not all(np.isfinite(t) for t in tails):
            st, kf_count, kf_slots, tidx, tpose, obs_counts = prev
            self._obs_counts = obs_counts
            self.state = self.state._replace(
                grids=st.grids, decoders=st.decoders, keyframes=st.keyframes
            )
            # The version-keyed tracker snapshot must not keep serving the
            # rejected (possibly-NaN) map to the PP tracker role until the
            # next publish (ADVICE r3 medium).
            self._track_snap_cache = None
            self._kf_count = kf_count
            self._kf_slot_frame = kf_slots
            # Restore the event frame's pose (BA may have poisoned it) and
            # scrub any non-finite poses tracked against the corrupted map
            # between publish and this verify (best-available containment:
            # hold the last finite pose).
            if tidx < len(self.est_c2w):
                self.est_c2w[tidx] = tpose
            last_good = tpose
            for k in range(tidx + 1, len(self.est_c2w)):
                p = np.asarray(self.est_c2w[k])
                if not np.isfinite(p).all():
                    self.est_c2w[k] = last_good
                else:
                    last_good = self.est_c2w[k]
            self.log.log(
                {
                    "event": "map_rejected",
                    "frame": passes[0][0],
                    "loss_last": [float(t) for t in tails],
                }
            )
            return
        for (idx, coarse, stages, losses), tail in zip(passes, tails):
            self.log.log(
                {
                    "event": "map",
                    "frame": idx,
                    "coarse": coarse,
                    "stages": stages,
                    "loss_first": float(np.asarray(losses)[0]),
                    "loss_last": float(tail),
                }
            )

    # ------------------------------------------------------------ precompile
    def _precompile_signatures(self):
        """Every (F, refine, ba) mapping-program signature a run can
        encounter.

        Since the stage schedule / LR values are traced data
        (mapper.run_schedule), the signature-bearing statics left are the
        window size F, the refine flag (frustum off) and the per-pass BA
        gate (camera gradient chain present)."""
        m = self.cfg.mapping
        W = m.mapping_window_size
        sigs = [(W, False, False)]
        if m.BA:
            # pcfg.ba keys on the per-pass gate: the BA-on program (camera
            # gradient chain present) is a second signature that first runs
            # mid-sequence, once >4 keyframes exist.
            sigs.append((W, False, True))
        if m.color_refine:
            sigs.append((2 * W, True, False))
            if m.BA:
                sigs.append((2 * W, True, True))
        return sigs

    def precompile(self):
        """Warm every mapper/tracker program with dummy inputs.

        Round 1 compiled 5+ distinct mapping programs and stalled minutes on
        mid-run first encounters (BENCH_r01 frame 5: 233 s); the unified
        traced-schedule program leaves exactly one hot mapping signature
        (plus the refine window when enabled) and the tracker. Dummy-input
        calls populate the jit dispatch cache (and the persistent compile
        cache). Values are discarded; the system PRNG is untouched (fixed
        key) so runs stay reproducible.
        """
        import jax.numpy as jnp  # local: thread-safe to call post-init

        m = self.cfg.mapping
        key = jax.random.PRNGKey(0)
        H, W_ = self.intr.H, self.intr.W
        color1 = jnp.ones((H, W_, 3), jnp.float32)
        depth1 = jnp.ones((H, W_), jnp.float32)
        eye = jnp.eye(4, dtype=jnp.float32)

        mesh_attached = getattr(self, "_runtime", None) is not None

        # tracker program (frames >= 1); with the PP role split also warm the
        # tracker-device executable (a distinct entry in jit's placement
        # cache, same reasoning as the stage-EP warm below). Committedness
        # must match the live call exactly (_commit) or the warm executable
        # is a different cache entry than the one the loop needs.
        if not self.cfg.tracking.gt_camera:
            c_t, dep_t, e_t, k_t = self._commit((color1, depth1, eye, key))
            track_frame(
                self.state.decoders, self.state.grids, self.bounds,
                self.scene_bound, self.intr, c_t, dep_t, e_t, k_t,
                self.tcfg, self.rcfg,
            )
            td = self._track_device()
            if td is not None:
                d_t, g_t, b_t, s_t, c_t, dep_t, e_t, k_t = self._commit(
                    (self.state.decoders, self.state.grids, self.bounds,
                     self.scene_bound, color1, depth1, eye, key),
                    td,
                )
                track_frame(
                    d_t, g_t, b_t, s_t, self.intr,
                    c_t, dep_t, e_t, k_t, self.tcfg, self.rcfg,
                )
        # keyframe-selection + frustum-mask helper programs
        if m.keyframe_selection_method == "overlap":
            k_o, e_o, dep_o, col_o, kf_o = self._commit(
                (key, eye, depth1, color1, self.state.keyframes.est_c2w)
            )
            kf_mod.keyframe_overlap_percentages(
                k_o, self.intr, e_o, dep_o, col_o, kf_o
            )

        for F, refine, ba in self._precompile_signatures():
            mcfg = self._make_mcfg(ba, refine, 1.0)
            plan = self._make_plan(m.iters, False, refine)
            sched_chunks, _ = chunked_schedule(plan, mcfg, m.iters)
            pcfg = self._make_pcfg(mcfg)
            colors = jnp.ones((F, H, W_, 3), jnp.float32)
            depths = jnp.ones((F, H, W_), jnp.float32)
            poses44 = jnp.tile(eye, (F, 1, 1))
            cams = jax.vmap(tensor_from_camera)(poses44)
            valid = jnp.ones((F,), bool)
            fixed = jnp.ones((F,), bool)
            if mcfg.frustum_feature_selection:
                masks = kf_mod.frustum_masks_for_levels(
                    poses44, valid, depths, self.intr, self.bounds,
                    self.state.grids,
                )
            else:
                masks = {
                    lvl: jnp.ones(g.shape[:3] + (1,), g.dtype)
                    for lvl, g in self.state.grids.items()
                }

            def warm(device=None):
                if mesh_attached:
                    g_w, d_w, m_w, c_w, col_w, dep_w, k_w = (
                        self.state.grids, self.state.decoders, masks, cams,
                        colors, depths, key,
                    )
                    v_w, f_w, b_w, sb_w, ch_w = (
                        valid, fixed, self.bounds, self.scene_bound,
                        sched_chunks,
                    )
                else:
                    (g_w, d_w, m_w, c_w, col_w, dep_w, k_w, v_w, f_w, b_w,
                     sb_w, ch_w) = self._commit(
                        (self.state.grids, self.state.decoders, masks, cams,
                         colors, depths, key, valid, fixed, self.bounds,
                         self.scene_bound, sched_chunks),
                        device,
                    )
                opt_w = init_opt_state(
                    {"grids": g_w, "decoders": d_w, "cams": c_w}
                )
                if not mesh_attached:
                    opt_w = self._commit(opt_w, device)
                self.run_schedule_fn(
                    g_w, d_w, c_w, m_w, b_w, sb_w, self.intr, col_w, dep_w,
                    v_w, f_w, k_w, ch_w[0], opt_w, pcfg, self.rcfg,
                )

            warm()
            # stage-EP: the coarse expert executes the same program ON
            # DEVICE 1 — a distinct executable in jit's device-placement
            # cache. Warm it too, or the first EP coarse pass reintroduces
            # the mid-run first-encounter stall (r2 ADVICE low #3).
            # The EP device only ever runs the coarse pass, which always has
            # ba=False — warming the ba=True signature there would be a
            # multi-minute compile for a program that never runs on device 1
            # (ADVICE r3 low).
            if (
                not refine
                and not ba
                and self.cfg.parallel.stage_ep
                and not mesh_attached
                and len(jax.devices()) > 1
            ):
                warm(jax.devices()[1])

    def precompile_async(self):
        """Run precompile() on a daemon thread, overlapped with early frames
        (jit dispatch is thread-safe; compiles run in XLA's own pool)."""
        import threading

        t = threading.Thread(
            target=self.precompile, daemon=True, name="niceslam-precompile"
        )
        t.start()
        return t

    def flush(self):
        """Settle all deferred async results (pending guard, loss curves)."""
        self._verify_pending()
        if self._track_loss_dev:
            for curve in self._track_loss_dev:
                self.track_losses.append(float(np.asarray(curve)[-1]))
            self._track_loss_dev = []
        self.est_c2w = [np.asarray(p, np.float32) for p in self.est_c2w]

    # ------------------------------------------------------------------ run
    def step(self, frame: Frame):
        """Process one frame: track, then map if scheduled."""
        idx = len(self.est_c2w)
        t0 = time.perf_counter()
        first = idx == 0
        # One H2D transfer per frame: track and map share the device copy
        # (jnp.asarray is a no-op if the prefetcher already device_put it).
        frame = Frame(
            idx=frame.idx,
            color=jnp.asarray(frame.color),
            depth=jnp.asarray(frame.depth),
            gt_c2w=frame.gt_c2w,
        )
        with self.timer.section("track"), annotate("track"):
            self.track(frame)
        # Bootstrap phase: for the first `bootstrap_frames` frames, map EVERY
        # frame. The init map is fit to frame 0's rays only; its novel-view
        # error grows with view distance, so by the second every_frame-th
        # event the tracked pose error is already several cm and gets baked
        # into the map (measured: the frame 3-7 segment dominates final
        # ATE). Re-anchoring each early frame keeps tracking against an
        # in-distribution map for a total of (bootstrap-1) * iters extra
        # iterations — a few percent of the init pass budget.
        if (
            first
            or idx < self.cfg.mapping.bootstrap_frames
            or (idx % self.cfg.mapping.every_frame == 0)
            or idx == self.n_imgs - 1
        ):
            with self.timer.section("map"), annotate("map"):
                self.map_frame(frame, first=first)
        if (
            self.vis_dir
            and idx % max(self.cfg.mapping.vis_freq, 1) == 0
            and not (idx == 0 and self.cfg.tracking.no_vis_on_first_frame)
        ):
            from ..utils.visualizer import save_frame_vis

            save_frame_vis(
                self.vis_dir, idx, self.state.decoders, self.state.grids,
                self.bounds, self.scene_bound, self.intr, self.est_c2w[-1],
                frame.color, frame.depth, self.rcfg,
            )
        self.log.frame_done()
        self.log.log(
            {
                "event": "frame",
                "frame": idx,
                "dt": round(time.perf_counter() - t0, 4),
                "fps_avg": round(self.log.fps, 3),
                "track_loss": (
                    self.track_losses[-1]
                    if idx > 0 and self.track_losses
                    and self.sync_method != "async"
                    else None
                ),
            }
        )

    def run(self, n_frames: Optional[int] = None):
        n = len(self.reader) if n_frames is None else min(n_frames, len(self.reader))
        self.n_imgs = n
        from ..io.prefetch import Prefetcher

        pf = Prefetcher(self.reader, device=jax.devices()[0], end=n)
        try:
            for frame in pf:
                self.step(frame)
        finally:
            pf.close()
        return self.result()

    def restore(self, ckpt_path: str) -> int:
        """Resume from an orbax checkpoint; returns the next frame index.

        The recovery path for host/process failure (SURVEY.md §5 "Failure
        detection"): reload {map, keyframes, trajectory} and continue the
        frame loop from where the snapshot was taken.
        """
        from ..utils.checkpoint import load_checkpoint

        payload = load_checkpoint(ckpt_path)
        # load_checkpoint returns HOST numpy (topology-portable); the live
        # state must be device arrays — the driver's window assembly uses
        # jax-array ops (.at[...]) on the keyframe DB.
        self.state = jax.tree_util.tree_map(jnp.asarray, payload["state"])
        # Bounds travel WITH the grids: a snapshot taken while attached to a
        # ('map','kf') mesh has Z-padded grids and correspondingly extended
        # z bounds — restoring the grids without the bounds skews every
        # consumer's world->voxel mapping (r2 ADVICE medium). Older
        # snapshots lack them; those were never padded, so the config-derived
        # bounds in self.bounds already match.
        if payload.get("bounds") is not None:
            self.bounds = {
                k: jnp.asarray(v) for k, v in payload["bounds"].items()
            }
        if payload.get("scene_bound") is not None:
            self.scene_bound = jnp.asarray(payload["scene_bound"])
        # Re-attach to the mesh if one is installed: re-pad (no-op when the
        # snapshot was already padded for the same map extent) and re-place
        # the restored host arrays with their Z axis sharded.
        if getattr(self, "_runtime", None) is not None:
            self._runtime.reattach_grids(self)
        self.est_c2w = [np.asarray(p, np.float32) for p in payload["est_c2w"]]
        self.gt_c2w = payload["gt_c2w"]
        # Rebuild the host mirrors of the keyframe-DB bookkeeping — without
        # this the resumed host's slot arithmetic permanently diverges from
        # the device DB (ADVICE r1 high #1).
        self._kf_count = int(self.state.keyframes.count)
        self._kf_slot_frame = np.asarray(
            self.state.keyframes.frame_idx, np.int64
        ).copy()
        # Restored state may reuse a pre-restore version number; drop the
        # version-keyed tracker snapshot so the PP tracker re-pins the
        # restored map (and bounds) instead of a stale cache entry
        # (ADVICE r3 medium).
        self._track_snap_cache = None
        return payload["frame_idx"] + 1

    def result(self):
        self.flush()
        out = {"est_c2w": self.est_c2w, "gt_c2w": self.gt_c2w}
        gts = [g for g in self.gt_c2w if g is not None]
        if len(gts) == len(self.est_c2w) and len(gts) > 1:
            from ..eval.ate import ate_rmse

            out["ate_rmse"] = ate_rmse(self.est_c2w, gts)
        return out
