"""Analytic roofline model for the system's hot ops (BASELINE.md last row).

Per-op FLOP and byte counts derived from shapes, combined with the chip's
peak compute/bandwidth into a speed-of-light time:

    t_sol = max(bytes / BW_peak, flops / FLOP_peak)

``achieved = t_sol / t_measured`` is the fraction of speed-of-light
(scripts/kernel_bench.py reports it per op; bench.py reports the whole
mapping-step aggregate). All of this system's hot ops are BANDWIDTH-bound
(tiny-MLP matmuls are 32-wide; the gather/scatter traffic of trilinear
interpolation dominates), so the rooflines below are dominated by the bytes
term — the relevant "MFU" for this workload is bandwidth utilization.

Peaks are per-chip and device-kind keyed; unknown kinds fall back to v5e
numbers (the BASELINE hardware envelope).
"""
from __future__ import annotations

from typing import Dict, NamedTuple


class ChipPeaks(NamedTuple):
    name: str
    flops_bf16: float  # FLOP/s
    flops_f32: float   # FLOP/s (MXU f32 passes)
    hbm_gbps: float    # bytes/s / 1e9


# Public per-chip numbers (TPU product pages / scaling-book tables).
_PEAKS = {
    # jax device_kind substrings (lowercased)
    "v5 lite": ChipPeaks("v5e", 197e12, 49e12, 819.0),
    "v5litepod": ChipPeaks("v5e", 197e12, 49e12, 819.0),
    "v5p": ChipPeaks("v5p", 459e12, 115e12, 2765.0),
    "v4": ChipPeaks("v4", 275e12, 69e12, 1228.0),
    "v6": ChipPeaks("v6e", 918e12, 230e12, 1640.0),
    "cpu": ChipPeaks("cpu", 1e12, 5e11, 50.0),  # rough; tests only
}


def device_peaks(device=None) -> ChipPeaks:
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for k, v in _PEAKS.items():
        if k in kind:
            return v
    return _PEAKS["v5 lite"]


def sol_ms(flops: float, bytes_: float, peaks: ChipPeaks,
           dtype: str = "f32") -> float:
    """Speed-of-light milliseconds for an op of given analytic cost."""
    f_peak = peaks.flops_bf16 if dtype == "bf16" else peaks.flops_f32
    t = max(bytes_ / (peaks.hbm_gbps * 1e9), flops / f_peak)
    return t * 1e3


# ---------------------------------------------------------------- op costs
def trilinear_cost(n_pts: int, c_dim: int, grid_bytes: int,
                   backward: bool = False) -> Dict[str, float]:
    """8 corner-row gathers + lerp per point; VJP adds a scatter-add of the
    same traffic. Traffic model: every corner read misses (worst case), but
    never more than the whole grid + index streams."""
    elem = 4  # f32
    gather = min(8 * n_pts * c_dim * elem, grid_bytes + 8 * n_pts * 4)
    out = n_pts * c_dim * elem
    bytes_ = gather + out
    flops = n_pts * c_dim * 14  # 7 lerps x (mul+add)
    if backward:
        bytes_ *= 2   # re-gather weights + scatter-add corner rows
        flops *= 2
    return {"flops": float(flops), "bytes": float(bytes_)}


def mlp_cost(n_pts: int, hidden: int = 32, emb: int = 93,
             c_in: int = 32, color: bool = False,
             backward: bool = False) -> Dict[str, float]:
    """5-block tiny MLP: emb matmul + 5 hidden matmuls + 5 fc_c adds + out.

    Activation traffic dominates (params fit VMEM): ~N*(emb + 6*hidden).
    """
    out_dim = 4 if color else 1
    f = 2 * n_pts * (
        3 * emb                      # fourier sin(x@B)
        + emb * hidden               # layer 0
        + 4 * hidden * hidden        # layers 1-4 (pre-skip widths approx)
        + (hidden + emb) * hidden    # skip re-concat layer
        + 5 * c_in * hidden          # per-layer fc_c projections
        + (hidden + emb) * out_dim
    )
    bytes_ = n_pts * (3 + emb + 6 * hidden + c_in + out_dim) * 4
    if backward:
        f *= 3       # fwd + two matmuls per layer in bwd
        bytes_ *= 2
    return {"flops": float(f), "bytes": float(bytes_)}


def compositing_cost(n_rays: int, n_samples: int) -> Dict[str, float]:
    n = n_rays * n_samples
    return {"flops": float(n * 12), "bytes": float(n * 6 * 4)}


def render_cost(n_rays: int, n_samples: int, c_dim: int,
                grid_bytes: Dict[str, int], stage: str = "color",
                backward: bool = False) -> Dict[str, float]:
    """Aggregate analytic cost of render_rays at a stage (decoder levels it
    touches per models/decoders.nice_forward routing)."""
    n = n_rays * n_samples
    # models/decoders.py samples the middle feature ONCE for the fine+middle
    # residual path (_geo_occ), so the fine/color stages cost exactly one
    # trilinear + one MLP per listed level.
    levels = {
        "coarse": ["coarse"],
        "middle": ["middle"],
        "fine": ["fine", "middle"],
        "color": ["color", "fine", "middle"],
    }[stage]
    flops = bytes_ = 0.0
    for lvl in levels:
        t = trilinear_cost(n, c_dim, grid_bytes.get(lvl, 1 << 30), backward)
        flops += t["flops"]
        bytes_ += t["bytes"]
        m = mlp_cost(
            n, c_in=2 * c_dim if lvl == "fine" else c_dim,
            color=lvl == "color", backward=backward,
        )
        flops += m["flops"]
        bytes_ += m["bytes"]
    c = compositing_cost(n_rays, n_samples)
    flops += c["flops"]
    bytes_ += c["bytes"]
    return {"flops": flops, "bytes": bytes_}


def mapping_step_cost(n_pixels: int, n_samples: int, c_dim: int,
                      grid_bytes: Dict[str, int]) -> Dict[str, float]:
    """One joint mapping iteration: fwd + bwd render at the color stage
    (worst case) + Adam over the grids."""
    r = render_cost(n_pixels, n_samples, c_dim, grid_bytes, "color",
                    backward=True)
    adam_bytes = 4 * sum(grid_bytes.values())  # read p,m,v + write (masked)
    return {"flops": r["flops"], "bytes": r["bytes"] + adam_bytes}
