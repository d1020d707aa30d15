"""Import upstream pretrained decoder checkpoints (.pt) into our params.

The reference's actual forward path runs traced TorchScript decoders loaded
from pretrained checkpoints (reference: src/models/NICE.cpp:8-11;
config/nice_slam.yaml pretrained_decoders.*) — pretrained coarse and
middle/fine decoders are part of intended behavior (middle/fine are then
frozen: fix_fine). This module maps upstream ``nn.Module`` state dicts onto
our functional param pytrees. torch (CPU) is only imported here, never on
the hot path.

Upstream naming (decoder.py):
  <level>_decoder.pts_linears.{i}.weight/bias    -> params[level]['linears'][i]
  <level>_decoder.fc_c.{i}.weight/bias           -> params[level]['fc_c'][i]
  <level>_decoder.output_linear.weight/bias      -> params[level]['out']
  <level>_decoder.embedder._B  (if saved)        -> params[level]['embed_B']
Weights transpose: torch Linear stores [out, in]; we use [in, out].
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:
        blob = blob["model"]
    return {k: _to_np(v) for k, v in blob.items() if hasattr(v, "detach")}


def _apply_level(params_level, sd: Dict[str, np.ndarray], prefix: str):
    import jax.numpy as jnp

    out = dict(params_level)
    n_lin = len(out["linears"])
    for i in range(n_lin):
        w = sd.get(f"{prefix}.pts_linears.{i}.weight")
        b = sd.get(f"{prefix}.pts_linears.{i}.bias")
        if w is not None:
            out["linears"] = list(out["linears"])
            out["linears"][i] = {
                "w": jnp.asarray(w.T),
                "b": jnp.asarray(b),
            }
    if "fc_c" in out:
        for i in range(len(out["fc_c"])):
            w = sd.get(f"{prefix}.fc_c.{i}.weight")
            b = sd.get(f"{prefix}.fc_c.{i}.bias")
            if w is not None:
                out["fc_c"] = list(out["fc_c"])
                out["fc_c"][i] = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}
    w = sd.get(f"{prefix}.output_linear.weight")
    if w is not None:
        out["out"] = {
            "w": jnp.asarray(w.T),
            "b": jnp.asarray(sd[f"{prefix}.output_linear.bias"]),
        }
    for bkey in (f"{prefix}.embedder._B", f"{prefix}.embedder.B"):
        if bkey in sd and "embed_B" in out:
            out["embed_B"] = jnp.asarray(sd[bkey])
    return out


# ------------------------------------------------------- native .npz format
def save_decoders_npz(path: str, params) -> None:
    """Save a decoder pytree as flat npz (the framework's own pretrain
    format — scripts/pretrain_decoders.py; torch-free)."""
    import jax

    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in kp
        )
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_decoders_npz(path: str, params):
    """Overlay a flat-npz decoder checkpoint onto ``params`` (strict keys)."""
    import jax
    import jax.numpy as jnp

    blob = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for kp, leaf in leaves:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in kp
        )
        if key not in blob:
            raise KeyError(f"pretrained npz missing decoder leaf {key!r}")
        arr = blob[key]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"decoder leaf {key!r}: checkpoint {arr.shape} vs model "
                f"{leaf.shape}"
            )
        out.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, out)


def load_pretrained_decoders(
    params, coarse_path: str = "", middle_fine_path: str = ""
):
    """Overlay upstream checkpoints onto ``params`` (missing keys keep init).

    ``.npz`` paths use the framework's native pretrain format (full decoder
    pytree, scripts/pretrain_decoders.py); ``.pt`` paths import upstream
    torch state dicts.
    """
    if middle_fine_path and middle_fine_path.endswith(".npz"):
        return load_decoders_npz(middle_fine_path, params)
    if coarse_path:
        sd = load_state_dict(coarse_path)
        params = dict(params)
        params["coarse"] = _apply_level(params["coarse"], sd, "coarse_decoder")
        # some exports name it just 'decoder'
        params["coarse"] = _apply_level(params["coarse"], sd, "decoder")
    if middle_fine_path:
        sd = load_state_dict(middle_fine_path)
        params = dict(params)
        params["middle"] = _apply_level(params["middle"], sd, "middle_decoder")
        params["fine"] = _apply_level(params["fine"], sd, "fine_decoder")
    return params
