"""Depth sampling along rays: stratified + depth-guided surface samples.

TPU-native equivalent of the z-value construction in the reference renderer
(reference: src/Renderer.cpp:80-119). All shapes are static: rows with zero
ground-truth depth are handled with `jnp.where` instead of boolean gathers
(the reference's index_put_ split), so one compiled kernel covers every ray
batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    perturb: float = 0.0,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """``n_samples`` z-values linearly spaced in [near, far] per ray.

    ``near`` is ``[N, n_samples]`` (per-sample near, as the reference tiles
    0.01*gt_depth), ``far`` is ``[N, 1]``. Optional stratified jitter
    (reference src/Renderer.cpp:108-116; perturb defaults off per
    config/nice_slam.yaml perturb: 0.0).
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    z_vals = near * (1.0 - t_vals) + far * t_vals
    if perturb > 0.0:
        if key is None:
            raise ValueError("perturb > 0 requires a PRNG key")
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def surface_z_vals(
    gt_depth: jnp.ndarray,
    n_surface: int,
    band: float = 0.05,
) -> jnp.ndarray:
    """``n_surface`` z-values bracketing the observed surface per ray.

    Reference semantics (src/Renderer.cpp:80-99): rays with gt_depth > 0 get
    samples linearly spanning [1-band, 1+band] * gt_depth (reference
    hard-codes band=0.05); rays with zero depth span
    [1e-3, max(gt_depth in batch)] instead. Implemented as a where-blend
    so shapes stay static.

    ``band`` sets the depth-integration resolution: rendered depth is the
    alpha-weighted sum over these samples, so their spacing
    (2*band*gt/(n-1) — 1.6 cm at upstream's 0.05/16 and 2.4 m range) lower-
    bounds the achievable render-depth accuracy, which in turn displaced
    the tracking-loss minimum ~1.4 cm (measured r5, /tmp-probe on a
    GT-pose map). The bench config tightens it.
    """
    gt = gt_depth.reshape(-1, 1)
    t = jnp.linspace(0.0, 1.0, n_surface, dtype=gt.dtype)
    z_nonzero = (1.0 - band) * gt * (1.0 - t) + (1.0 + band) * gt * t
    far_surface = jnp.max(gt)
    z_zero = 0.001 * (1.0 - t) + far_surface * t  # [n_surface]
    return jnp.where(gt > 0.0, z_nonzero, z_zero[None, :])


def merge_z_vals(z_strat: jnp.ndarray, z_surf: jnp.ndarray) -> jnp.ndarray:
    """Sort-merge stratified and surface samples along the ray.

    Reference: src/Renderer.cpp:118-119 (cat + sort). A length-(S1+S2) sort
    per ray; XLA lowers this to a bitonic sort on the VPU — fine at 48.
    """
    return jnp.sort(jnp.concatenate([z_strat, z_surf], axis=-1), axis=-1)


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Inverse-CDF importance sampling of ``n_samples`` z-values per ray.

    The hierarchical-sampling primitive behind N_importance (the reference
    declares N_importance in config/nice_slam.yaml:108 and src/Renderer.cpp:
    11 but, with value 0, never exercises it; this is the upstream-intent
    implementation). ``bins [N, B+1]``, ``weights [N, B]``. Deterministic
    midpoints when ``key`` is None. Static shapes; the searchsorted lowers
    to a vectorized binary search.
    """
    w = weights + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if key is None:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=bins.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(
            key, cdf.shape[:-1] + (n_samples,), dtype=bins.dtype
        )

    idx = jax.vmap(jnp.searchsorted)(cdf, u)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bin_b = jnp.take_along_axis(bins, jnp.clip(below, 0, bins.shape[-1] - 1), axis=-1)
    bin_a = jnp.take_along_axis(bins, jnp.clip(above, 0, bins.shape[-1] - 1), axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bin_b + t * (bin_a - bin_b)


def points_along_rays(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, z_vals: jnp.ndarray
) -> jnp.ndarray:
    """``o + d * z`` -> ``[N, S, 3]`` sample points (src/Renderer.cpp:121)."""
    return rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
