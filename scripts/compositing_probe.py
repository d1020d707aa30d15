"""Compositing-formulation probe (perf experiment, r3).

kernel_bench measured raw_to_outputs at 0.96 ms for 1000x48 rays — 700x off
its bandwidth roofline (0.0014 ms). Suspect: XLA lowers `cumprod` to a
sequential pass chain. Variants:

  cumprod   production path (jnp.cumprod of shifted 1-alpha)
  logmm     exclusive cumsum of log(1-alpha) via a strictly-lower-triangular
            [S, S] ones matmul (MXU), exponentiated back
  assoc     jax.lax.associative_scan (log-depth multiply tree)

Each fwd and fwd+bwd wrt raw. Prints one JSON line per variant.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from niceslam_tpu.core.compositing import raw_to_outputs  # noqa: E402

K = 64


def timeit_scanned(fn, *args, iters=6):
    @jax.jit
    def repeated(*args):
        def body(c, i):
            return c + fn(i, *args), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return out

    jax.block_until_ready(repeated(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(repeated(*args))
        ts.append((time.perf_counter() - t0) / K)
    return float(np.percentile(ts, 50) * 1e3)


def composite(raw, z_vals, rays_d, mode):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = raw[..., :3]
    alpha = jax.nn.sigmoid(10.0 * raw[..., 3])
    one_minus = 1.0 - alpha + 1e-10
    if mode == "cumprod":
        transmittance = jnp.cumprod(
            jnp.concatenate(
                [jnp.ones_like(one_minus[..., :1]), one_minus[..., :-1]],
                axis=-1,
            ),
            axis=-1,
        )
    elif mode == "logmm":
        S = one_minus.shape[-1]
        tri = jnp.tril(jnp.ones((S, S), one_minus.dtype), k=-1)  # strict
        transmittance = jnp.exp(
            jnp.log(one_minus) @ tri.T
        )  # [N,S] @ [S,S] -> exclusive cumsum
    elif mode == "assoc":
        shifted = jnp.concatenate(
            [jnp.ones_like(one_minus[..., :1]), one_minus[..., :-1]], axis=-1
        )
        transmittance = jax.lax.associative_scan(
            jnp.multiply, shifted, axis=-1
        )
    weights = alpha * transmittance
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    tmp = z_vals - depth_map[..., None]
    depth_var = jnp.sum(weights * tmp * tmp, axis=-1)
    return rgb_map, depth_map, depth_var


def main():
    key = jax.random.PRNGKey(0)
    n_rays, S = 1000, 48
    raw = jax.random.normal(key, (n_rays, S, 4))
    z = jnp.sort(jax.random.uniform(key, (n_rays, S)), axis=-1)
    rd = jax.random.normal(key, (n_rays, 3))

    ref = [np.asarray(x) for x in composite(raw, z, rd, "cumprod")]
    for mode in ("cumprod", "logmm", "assoc"):
        got = [np.asarray(x) for x in composite(raw, z, rd, mode)]
        err = max(float(np.abs(a - b).max()) for a, b in zip(ref, got))

        def fwd(i, raw, z, rd, mode=mode):
            r, d, v = composite(raw + i * 1e-6, z, rd, mode)
            return r.sum() + d.sum() + v.sum()

        t_f = timeit_scanned(fwd, raw, z, rd)

        def fwdbwd(i, raw, z, rd, mode=mode):
            g = jax.grad(
                lambda rr: sum(
                    x.sum() for x in composite(rr + i * 1e-6, z, rd, mode)
                )
            )(raw)
            return g.sum()

        t_fb = timeit_scanned(fwdbwd, raw, z, rd)
        print(
            json.dumps(
                {
                    "variant": mode, "fwd_ms": round(t_f, 4),
                    "fwdbwd_ms": round(t_fb, 4),
                    "max_abs_err": round(err, 9),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
