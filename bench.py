"""End-to-end SLAM benchmark on the reference workload envelope.

Runs the full tracker+mapper loop on the synthetic analytic scene at the
reference's budgets (BASELINE.md: 640x480 RGB-D, tracking 200 rays x 10
iters/frame, mapping 1000 rays x 60 iters every 5th frame, 32+16 samples,
c_dim 32 grid hierarchy), on whatever accelerator jax exposes (one TPU chip
under the driver), and reports steady-state tracked frames/s.

vs_baseline anchors to 1.0 frames/s — the reference-class system's
single-GPU envelope (upstream NICE-SLAM runs well under 1 fps end-to-end;
BASELINE.md "External anchor"). The BASELINE target is >= 2x that.

Prints exactly one JSON line on stdout.
"""
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    import jax

    # Persistent compile cache: TPU (remote-)compiles of the mapper/tracker
    # programs are tens of seconds; cache them across bench runs.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jaxcache-tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if os.environ.get("BENCH_LOG_COMPILES"):
        # Diagnose mid-run compile stalls: every XLA compile event is logged
        # with the jitted function name (VERDICT r3 ask #5).
        jax.config.update("jax_log_compiles", True)

    import numpy as np

    from niceslam_tpu.config.schema import (
        CamConfig,
        GridLenConfig,
        MappingConfig,
        SLAMConfig,
        TrackingConfig,
    )
    from niceslam_tpu.io.datasets.synthetic import SyntheticBoxReader
    from niceslam_tpu.slam.system import NiceSLAM

    # Pretrained decoders (upstream ships pretrained ConvONet decoders and
    # freezes middle/fine at SLAM time — reference src/models/NICE.cpp:8-11,
    # config/nice_slam.yaml:13-15,51). The checked-in artifact comes from
    # scripts/pretrain_decoders.py (multi-scene synthetic recipe).
    _here = os.path.dirname(os.path.abspath(__file__))
    _pretrained = os.path.join(_here, "models", "pretrained_decoders.npz")
    if not os.path.exists(_pretrained):
        log(
            "WARNING: models/pretrained_decoders.npz not found — benchmarking "
            "with FROZEN RANDOM decoders (not the reference operating point)"
        )
        _pretrained = ""

    # The r5 accuracy operating point (PERF_r05.md §3 causal chain):
    # free-space occupancy supervision (fs_weight), bootstrap mapping of
    # the first 5 frames, post-event re-tracking, a 2x GN tracking budget,
    # and the scalar depth-offset nuisance in the GN solve. Upstream
    # budgets are unchanged where the reference defines them (mapping
    # 1000 x 60 every 5th frame, 32+16 samples, c_dim 32).
    cfg = SLAMConfig(
        dataset="synthetic",
        bound=((-4.5, 3.82), (-1.5, 2.02), (-3.0, 2.76)),
        pretrained_middle_fine=_pretrained,
        cam=CamConfig(H=480, W=640, fx=360.0, fy=360.0, cx=320.0, cy=240.0),
        grid_len=GridLenConfig(),
        tracking=TrackingConfig(
            pixels=int(os.environ.get("BENCH_TRACK_PX", "400")),
            iters=20,
            gn_depth_offset_sigma=0.05,
        ),
        mapping=MappingConfig(
            pixels=1000,
            iters_first=1500,
            iters=60,
            every_frame=5,
            # Reference budget is keyframe_every=50 (nice_slam.yaml:60); the
            # default here admits keyframes 5x more often because the bench
            # trajectory (36-frame orbit) revisits nothing — at 50 the
            # window would hold <2 keyframes for the whole run. BENCH_KF=50
            # records the reference-budget number alongside (PERF_r05.md).
            keyframe_every=int(os.environ.get("BENCH_KF", "10")),
            mapping_window_size=5,
            max_keyframes=64,
            color_refine=False,
            bootstrap_frames=5,
            fs_weight=3.0,
            retrack=True,
        ),
        coarse=True,
        verbose=False,
        # Upstream NICE-SLAM runs tracker+mapper as concurrent processes on
        # one GPU; "async" is that semantics on JAX async dispatch (the host
        # never blocks inside the frame loop; publish guards are deferred
        # one event with rollback).
        sync_method=os.environ.get("BENCH_SYNC", "async"),
    )
    n_frames = int(os.environ.get("BENCH_FRAMES", "36"))
    reader = SyntheticBoxReader(cfg, n_frames=n_frames)
    slam = NiceSLAM(cfg, reader=reader)
    # Warm EVERY program signature before frame 0: on a tunneled chip,
    # compiles (and multi-second persistent-cache loads of the big mapping
    # program) serialize with execution, so overlapping the precompile
    # thread with the first frames just re-attributed its cost to whatever
    # frame was in flight (r3: an 18.5 s "frame 5" stall that was the
    # ba=True signature warming concurrently). Joining up front makes every
    # frame after 0 sub-second (VERDICT r3 ask #5).
    t0 = time.perf_counter()
    precompile_thread = slam.precompile_async()
    precompile_thread.join()
    log(f"precompile (all signatures): {time.perf_counter() - t0:.1f}s")

    # Pre-stage the synthetic frames on device before the timed region: the
    # metric is the SLAM engine's steady-state throughput, and the analytic
    # frame generator is harness, not engine (a real dataset feeds through
    # io/prefetch + the native EXR pool at few-ms/frame). 36 RGB-D frames
    # are ~165 MB on device.
    from niceslam_tpu.io.datasets.base import Frame

    dev = jax.devices()[0]
    frames = []
    for k in range(n_frames):
        f = reader[k]
        frames.append(
            Frame(
                idx=f.idx,
                color=jax.device_put(f.color, dev),
                depth=jax.device_put(f.depth, dev),
                gt_c2w=f.gt_c2w,
            )
        )
    jax.block_until_ready(frames[-1].color)
    pf = iter(frames)

    # Warmup: frame 0 runs the 1500-iter map init; later warmup frames hit
    # precompiled programs only.
    t0 = time.perf_counter()
    warm = 6
    for i in range(warm):
        tf = time.perf_counter()
        slam.step(next(pf))
        log(f"warmup frame {i}: {time.perf_counter() - tf:.1f}s")
    jax.block_until_ready(slam.state.grids)
    t_warm = time.perf_counter() - t0
    log(f"warmup {warm} frames (incl. compiles): {t_warm:.1f}s")

    t0 = time.perf_counter()
    for frame in pf:
        slam.step(frame)
    # Settle all in-flight device work inside the timed region: async mode
    # dispatches ahead, so fps must measure COMPLETED work (ADVICE r1 low #1).
    res = slam.result()
    jax.block_until_ready(slam.state.grids)
    dt = time.perf_counter() - t0
    fps = (n_frames - warm) / dt
    ate = res.get("ate_rmse")
    log(
        f"steady-state: {n_frames - warm} frames in {dt:.1f}s -> {fps:.3f} fps; "
        f"ATE RMSE = {None if ate is None else round(ate * 100, 3)} cm"
    )

    # Multi-seed ATE: the trajectory estimate at this operating point has
    # seed spread comparable to its mean (VERDICT r4 weak #1 — a single-
    # seed ATE is close to noise), so the headline accuracy is the MEAN
    # over BENCH_SEEDS runs (seed 0 above reuses the timed run; further
    # seeds reuse every compiled program, ~25-35 s each).
    ates = [] if ate is None else [float(ate)]
    for seed in range(1, int(os.environ.get("BENCH_SEEDS", "8"))):
        s2 = NiceSLAM(cfg, reader=reader, seed=seed)
        for k in range(n_frames):
            s2.step(frames[k])
        r2 = s2.result()
        jax.block_until_ready(s2.state.grids)
        if r2.get("ate_rmse") is not None:
            ates.append(float(r2["ate_rmse"]))
        log(f"seed {seed}: ATE RMSE = {round(100 * ates[-1], 3)} cm")
    ate_mean = float(np.mean(ates)) if ates else None

    # Whole-step roofline (BASELINE.md "speed-of-light, measured" row):
    # analytic FLOPs/bytes of the steady-state per-frame work -> achieved
    # fraction of the chip's bandwidth/compute peaks. The workload is
    # bandwidth-bound (tiny MLPs; gather/scatter trilinear traffic), so
    # hbm_util is the meaningful utilization; mfu is reported for context.
    from niceslam_tpu.utils import roofline

    peaks = roofline.device_peaks()
    gb = {lvl: g.size * 4 for lvl, g in slam.state.grids.items()}
    m_ = cfg.mapping
    t_ = cfg.tracking
    track_cost = roofline.render_cost(
        t_.pixels, 48, cfg.model.c_dim, gb, "color", backward=True
    )
    map_cost = roofline.mapping_step_cost(m_.pixels, 48, cfg.model.c_dim, gb)
    # per every_frame-frame group: every frame tracks (iters), one frame maps
    # (coarse pass + staged pass, iters each)
    per_group_flops = (
        m_.every_frame * t_.iters * track_cost["flops"]
        + 2 * m_.iters * map_cost["flops"]
    )
    per_group_bytes = (
        m_.every_frame * t_.iters * track_cost["bytes"]
        + 2 * m_.iters * map_cost["bytes"]
    )
    per_frame_s = dt / (n_frames - warm)
    group_s = per_frame_s * m_.every_frame
    hbm_util = per_group_bytes / (peaks.hbm_gbps * 1e9) / group_s
    mfu = per_group_flops / peaks.flops_f32 / group_s
    sol_group_s = max(
        per_group_bytes / (peaks.hbm_gbps * 1e9),
        per_group_flops / peaks.flops_f32,
    )
    sol_fps = m_.every_frame / sol_group_s
    log(
        f"roofline({peaks.name}): hbm_util={hbm_util:.3f} mfu={mfu:.4f} "
        f"speed-of-light fps={sol_fps:.1f}"
    )

    print(
        json.dumps(
            {
                "metric": "end_to_end_tracked_frames_per_s",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / 1.0, 4),
                "ate_rmse_cm": (
                    None if ate_mean is None else round(ate_mean * 100, 4)
                ),
                "ate_seed0_cm": None if ate is None else round(ate * 100, 4),
                "ate_seeds_cm": [round(a * 100, 3) for a in ates],
                "hbm_util": round(hbm_util, 4),
                "mfu": round(mfu, 5),
                "sol_fps": round(sol_fps, 2),
                "chip": peaks.name,
            }
        )
    )


if __name__ == "__main__":
    main()
