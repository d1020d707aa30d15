"""Typed, validated configuration system.

The reference threads raw ``YAML::Node``s through every constructor and reads
keys at use sites with no schema, no validation, and hard-coded absolute
paths (reference: src/main.cpp:7-8, src/Tracker.cpp:14-30, src/Mapper.cpp:
11-33; SURVEY.md §5 "Config / flag system"). Here: frozen dataclasses with
defaults mirroring config/nice_slam.yaml, a YAML loader with dataset-overlay
semantics (base algorithm config + per-dataset file, like the reference's
nice_slam.yaml + cofusion.yaml split), and dotted-path CLI overrides.

Dataclasses are hashable (frozen) so they can ride as static jit arguments.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, replace
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import yaml


@dataclass(frozen=True)
class CamConfig:
    """Pinhole camera + depth scaling (config/nice_slam.yaml cam block)."""

    H: int = 480
    W: int = 640
    fx: float = 360.0
    fy: float = 360.0
    cx: float = 320.0
    cy: float = 240.0
    png_depth_scale: float = 1.0
    crop_edge: int = 0


@dataclass(frozen=True)
class TrackingConfig:
    ignore_edge_W: int = 20
    ignore_edge_H: int = 20
    use_color_in_tracking: bool = True
    handle_dynamic: bool = True
    w_color_loss: float = 0.5
    seperate_LR: bool = False  # (sic) upstream key spelling preserved in YAML
    # Absolute depth-residual outlier gate [m]; 0 disables (see
    # slam/tracker.py TrackConfig.depth_err_gate).
    depth_err_gate: float = 0.3
    # Pose solver: "gn" (Gauss-Newton/IRLS, framework-native) or "adam"
    # (the reference's first-order loop). See slam/tracker.py.
    method: str = "gn"
    gn_prior_sigma_r: float = 0.02
    gn_prior_sigma_t: float = 0.03
    # Per-iteration GN trust region [m | rad] (slam/tracker.py
    # TrackConfig.gn_step_clip).
    gn_step_clip: float = 0.02
    # Scalar depth-offset nuisance prior sigma [m]; 0 disables (slam/
    # tracker.py TrackConfig.gn_depth_offset_sigma — absorbs the map's
    # uniform rendered-depth bias so it cannot walk the pose).
    gn_depth_offset_sigma: float = 0.0
    const_speed_assumption: bool = True
    gt_camera: bool = False
    lr: float = 0.001
    pixels: int = 200
    iters: int = 10
    vis_freq: int = 50
    vis_inside_freq: int = 25
    no_vis_on_first_frame: bool = True


@dataclass(frozen=True)
class StageLR:
    """Per-stage learning rates (config/nice_slam.yaml mapping.stage)."""

    decoders_lr: float = 0.0
    coarse_lr: float = 0.0
    middle_lr: float = 0.0
    fine_lr: float = 0.0
    color_lr: float = 0.0


@dataclass(frozen=True)
class MappingConfig:
    color_refine: bool = True
    middle_iter_ratio: float = 0.4
    fine_iter_ratio: float = 0.6
    every_frame: int = 5
    BA: bool = True
    BA_cam_lr: float = 0.001
    # BA activates once MORE THAN this many keyframes exist (upstream gate
    # src/Mapper.cpp:519 is a hard-coded 4). Lowering it lets the mapper
    # refine the tracked pose against the already-anchored map from the
    # first keyframed event on — the only mechanism that corrects tracker
    # drift before it is baked into the map.
    BA_min_keyframes: int = 4
    # Map every frame while idx < bootstrap_frames (0 = off). See
    # slam/system.py step(): bridges the single-view init map to the first
    # regular mapping events without letting tracker drift bake in.
    bootstrap_frames: int = 0
    # Per-event iteration budget for bootstrap-frame mapping events (0 =
    # mapping.iters). Extra budget here is compile-free (a longer pass
    # chains more chunks of the same compiled program) and targets the
    # early-transient regime where per-seed trajectory fate is decided
    # (PERF_r05.md section 3).
    bootstrap_iters: int = 0
    fix_fine: bool = True
    fix_color: bool = False
    keyframe_every: int = 50
    mapping_window_size: int = 5
    w_color_loss: float = 0.2
    # Grid feature-smoothness (TV) weight (slam/mapper.py
    # ProgConfig.tv_weight); 0 disables.
    tv_weight: float = 0.0
    # Free-space / near-surface occupancy supervision weight and transition
    # half-width [m] (slam/mapper.py ProgConfig.fs_weight/fs_band); 0
    # disables. Carves observed free space to truly-empty so novel-view
    # depth loses its 10-40 cm tail (the r5 tracking-bias root cause).
    fs_weight: float = 0.0
    fs_band: float = 0.05
    # Re-solve the event frame's pose against the JUST-updated map at the
    # end of each mapping event, before keyframe admission (slam/system.py
    # map_frame). Tracking against a frozen fresh map is a well-posed
    # solve (measured r5: GN converges to ~1.5 cm from 2-10 cm starts on an
    # fs-supervised map), unlike early BA which jointly deforms map AND
    # poses while both are underdetermined (measured: BA_cam_lr 5e-3 at
    # BA_min_keyframes=1 tripled early-trajectory error). This breaks the
    # bake-in feedback loop: the pose stored with each keyframe is
    # consistent with the map state it was admitted into. No reference
    # equivalent (upstream tracks each frame once, before its mapping
    # event).
    retrack: bool = False
    # Observed-voxel locking (0 disables): a voxel that has been inside the
    # optimized frustum for `lock_after` mapping events stops receiving
    # grid updates (its gradient mask goes to zero). Rationale (measured
    # r5, PERF_r05.md §3): the tracking-solve bias is map-relative, so
    # against a FROZEN map the pose error is bounded (~1.5 cm); the error
    # ACCUMULATES only through mapping events re-deforming already-settled
    # geometry to fit the current (drifted) frame — at 150 frames this ran
    # the trajectory meters off. Locking settled voxels pins the global
    # gauge to the earliest well-observed geometry; new regions train
    # freely. iMAP/Co-SLAM-family certainty weighting, binarized; no
    # reference equivalent.
    lock_after: int = 0
    frustum_feature_selection: bool = True
    keyframe_selection_method: str = "overlap"
    lr_first_factor: float = 5.0
    lr_factor: float = 1.0
    pixels: int = 1000
    iters_first: int = 1500
    iters: int = 60
    max_keyframes: int = 128  # static ring-buffer capacity (new; TPU shapes)
    # When no pretrained decoders are configured: 'never' keeps the random
    # decoders frozen (grids invert them — surprisingly strong and keeps the
    # occupancy scale sane), 'init' trains every decoder during the
    # first-frame init pass only (a per-scene decoder fit), 'always' keeps
    # them training in every mapping event (can blow up the occupancy
    # logit scale — bench r2 probes). With pretrained checkpoints this knob
    # is ignored (upstream fix_fine semantics apply).
    decoder_train: str = "never"
    # LR used for decoder training in stages whose upstream LR-table entry
    # is 0 (only relevant when decoder_train != 'never').
    decoders_lr: float = 0.005
    stage_coarse: StageLR = StageLR(coarse_lr=0.001)
    stage_middle: StageLR = StageLR(middle_lr=0.1)
    stage_fine: StageLR = StageLR(middle_lr=0.005, fine_lr=0.005)
    stage_color: StageLR = StageLR(
        decoders_lr=0.005, middle_lr=0.005, fine_lr=0.005, color_lr=0.005
    )
    vis_freq: int = 50
    mesh_freq: int = 50
    ckpt_freq: int = 500

    def stage_lr(self, stage: str) -> StageLR:
        return getattr(self, f"stage_{stage}")


@dataclass(frozen=True)
class RenderingConfig:
    N_samples: int = 32
    N_surface: int = 16
    N_importance: int = 0
    lindisp: bool = False
    perturb: float = 0.0
    # Surface-sample half-band as a fraction of gt depth (upstream
    # hard-codes 0.05; render/renderer.py RenderConfig.surface_band).
    surface_band: float = 0.05


@dataclass(frozen=True)
class ModelConfig:
    c_dim: int = 32
    hidden_size: int = 32
    coarse_bound_enlarge: float = 2.0
    pos_embedding_method: str = "fourier"


@dataclass(frozen=True)
class GridLenConfig:
    coarse: float = 2.0
    middle: float = 0.32
    fine: float = 0.16
    color: float = 0.16
    bound_divisable: float = 0.32


@dataclass(frozen=True)
class ParallelConfig:
    """Multi-host / multi-chip runtime (new design; the reference is pinned
    to one CUDA device, SURVEY.md §2.2). Consumed by parallel/runtime.py."""

    n_processes: int = 1  # hosts; >1 triggers jax.distributed.initialize
    coordinator: str = "localhost:9991"  # process-0 coordinator address
    kf: int = 0  # ray-DP mesh axis extent; 0 = all devices not used by `map`
    map: int = 1  # grid-Z-shard mesh axis extent
    # Stage-expert placement (SURVEY.md §2.2 EP/PP rows): run the coarse
    # mapper pass on a second device, concurrent with the staged pass on
    # device 0. Exact: the coarse stage touches only the coarse grid /
    # decoder, disjoint from middle/fine/color. No-op with one device.
    stage_ep: bool = False
    # Tracker/mapper pipeline-role split (SURVEY.md §2.2 PP row: the
    # upstream two-process design as TPU mesh roles): pin the tracker's
    # program to the LAST visible device, disjoint from the staged mapper
    # on device 0 (and from the coarse expert on device 1 when >=3 devices).
    # The tracker reads a published map snapshot (one async D2D copy per
    # mapping event); identical math on a different chip, so exact. No-op
    # with one device or with a ('map','kf') mesh attached.
    track_role: bool = False


@dataclass(frozen=True)
class MeshingConfig:
    """Offline mesher options (reference config/nice_slam.yaml:16-25 —
    declared there, read by nothing; implemented in eval/mesher.py)."""

    level_set: float = 0.0
    resolution: int = 256
    eval_rec: bool = False
    # Cull mesh geometry never observed by the trajectory (project every
    # vertex into each camera; keep faces with a frustum-visible vertex).
    clean_mesh: bool = True
    # Additionally require vertices to pass the per-view depth test
    # (not behind the observed surface by > its depth x (scale - 1)).
    depth_test: bool = False
    mesh_coarse_level: bool = False
    clean_mesh_bound_scale: float = 1.02
    get_largest_components: bool = False
    color_mesh_extraction_method: str = "direct_point_query"


@dataclass(frozen=True)
class SLAMConfig:
    """Top-level system config (mirrors config/nice_slam.yaml)."""

    coarse: bool = True
    sync_method: str = "strict"
    scale: float = 1.0
    verbose: bool = True
    occupancy: bool = True
    dataset: str = "synthetic"
    data_input_folder: str = ""
    output: str = "output"
    # Scene bound [[x0,x1],[y0,y1],[z0,z1]] - config-driven, never hard-coded
    # (fixes SURVEY.md §2.9.11).
    bound: Tuple[Tuple[float, float], ...] = (
        (-4.5, 3.82),
        (-1.5, 2.02),
        (-3.0, 2.76),
    )
    grid_len: GridLenConfig = GridLenConfig()
    model: ModelConfig = ModelConfig()
    cam: CamConfig = CamConfig()
    tracking: TrackingConfig = TrackingConfig()
    mapping: MappingConfig = MappingConfig()
    rendering: RenderingConfig = RenderingConfig()
    parallel: ParallelConfig = ParallelConfig()
    meshing: MeshingConfig = MeshingConfig()
    pretrained_coarse: str = ""
    pretrained_middle_fine: str = ""


_NESTED = {
    "grid_len": GridLenConfig,
    "model": ModelConfig,
    "cam": CamConfig,
    "tracking": TrackingConfig,
    "mapping": MappingConfig,
    "rendering": RenderingConfig,
    "parallel": ParallelConfig,
    "meshing": MeshingConfig,
}

_KEY_ALIASES = {
    # upstream yaml key -> dataclass field
    "hidden": "hidden_size",
}


def _build(cls, data: Dict[str, Any]):
    """Construct a dataclass from a dict, validating keys and types."""
    valid = {f.name: f for f in fields(cls)}
    kwargs = {}
    for k, v in data.items():
        k = _KEY_ALIASES.get(k, k)
        if k == "stage" and cls is MappingConfig:
            for s, lrs in v.items():
                kwargs[f"stage_{s}"] = _build(StageLR, lrs)
            continue
        if k not in valid:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        f = valid[k]
        if dataclasses.is_dataclass(f.type) or f.name in _NESTED:
            kwargs[k] = _build(_NESTED[f.name], v)
        elif f.name == "bound":
            kwargs[k] = tuple(tuple(float(x) for x in row) for row in v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def _deep_merge(base: Dict[str, Any], over: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _apply_overrides(data: Dict[str, Any], overrides: Dict[str, Any]):
    for dotted, v in overrides.items():
        node = data
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return data


def load_config(
    path: str | Path | None = None,
    base: str | Path | None = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> SLAMConfig:
    """Load a dataset config, overlaying it on a base algorithm config.

    ``path`` may declare ``inherit_from: <relative path>``; explicit ``base``
    wins over that. Overrides use dotted paths: ``{"tracking.lr": 0.01}``.
    """
    def _load_chain(p: Path) -> Dict[str, Any]:
        """Resolve ``inherit_from`` RECURSIVELY (a dataset file may inherit a
        dataset family file that itself inherits the base algorithm config —
        e.g. cofusion_synth849.yaml -> cofusion.yaml -> niceslam.yaml)."""
        with open(p) as f:
            d = yaml.safe_load(f) or {}
        parent = d.pop("inherit_from", None)
        if parent is not None:
            d = _deep_merge(_load_chain(Path(p).parent / parent), d)
        return d

    data: Dict[str, Any] = {}
    if path is not None:
        data = _load_chain(Path(path))
    if base is not None:
        data = _deep_merge(_load_chain(Path(base)), data)
    if overrides:
        data = _apply_overrides(data, overrides)
    # normalize alternate key spellings from upstream-style yamls
    for blk in ("tracking", "mapping"):
        blk_d = data.get(blk)
        if isinstance(blk_d, dict):
            blk_d.pop("device", None)  # device pinning is meaningless here
            for k in ("no_mesh_on_first_frame", "no_log_on_first_frame",
                      "save_selected_keyframes_info", "vis_inside_freq"):
                if blk != "tracking" or k != "vis_inside_freq":
                    blk_d.pop(k, None)
    if isinstance(data.get("data"), dict):
        d = data.pop("data")
        if "input_folder" in d:
            data["data_input_folder"] = d["input_folder"]
        if "output" in d:
            data["output"] = d["output"]
    if isinstance(data.get("pretrained_decoders"), dict):
        pd = data.pop("pretrained_decoders")
        data["pretrained_coarse"] = pd.get("coarse", "")
        data["pretrained_middle_fine"] = pd.get("middle_fine", "")
    data.pop("low_gpu_mem", None)
    return _build(SLAMConfig, data)


def with_override(cfg: SLAMConfig, **kw) -> SLAMConfig:
    return replace(cfg, **kw)
