"""Checkpoint save/load, wire-compatible with the reference's .tar files.

The reference bundles weights + run metadata into a torch.save dict
(misc.py:21-66): {epoch, state_dict, optimizer, effect_name, knob_names,
knob_ranges, scale_factor, shrink_factor, in_chunk_size, out_chunk_size, sr}.
We emit and consume exactly that schema (torch is available CPU-side), so

* checkpoints trained here load into the PyTorch reference, and
* reference-trained checkpoints (e.g. the comp4c/denoise demo models) import
  losslessly for the <=1e-3 parity targets in BASELINE.json.

Weight-layout mapping (flax <-> torch):
  dft_analysis.w_real  (ft,ft)  <-> mpaec.dft_analysis.conv_analysis_real.weight  (ft,1,ft)
  dft_synthesis.w_real (ft,ft)  <-> mpaec.dft_synthesis.conv_synthesis_real.weight (ft,1,ft)
  aenc.fnn_*.kernel    (in,out) <-> mpaec.aenc.fnn_*.weight (out,in)   [transpose]
  aenc.fnn_*.bias      (out,)   <-> mpaec.aenc.fnn_*.bias

Additionally our own optax optimizer state is stored under 'optax_state'
(ignored by the reference loader) and *is* restored on resume — fixing the
reference's open TODO (train.py:229).
"""

from __future__ import annotations

import os
import sys
from typing import Any

import jax
import numpy as np

_AE_LAYERS = (
    "fnn_enc", "fnn_enc2", "fnn_enc3", "fnn_enc4", "fnn_addknobs",
    "fnn_dec4", "fnn_dec3", "fnn_dec2", "fnn_dec",
)


def params_to_torch_state_dict(params) -> dict:
    """flax params -> torch-layout state_dict of torch tensors."""
    import torch

    p = params["params"]
    sd = {}
    for side, torch_name in (
        ("dft_analysis", "conv_analysis"),
        ("dft_synthesis", "conv_synthesis"),
    ):
        for part in ("real", "imag"):
            w = np.asarray(p[side][f"w_{part}"], dtype=np.float32)
            sd[f"mpaec.{side}.{torch_name}_{part}.weight"] = torch.from_numpy(
                w[:, None, :].copy()
            )
    for ae in ("aenc", "phs_aenc"):
        for layer in _AE_LAYERS:
            node = p[ae][layer]
            sd[f"mpaec.{ae}.{layer}.weight"] = torch.from_numpy(
                np.asarray(node["kernel"], dtype=np.float32).T.copy()
            )
            if "bias" in node:
                sd[f"mpaec.{ae}.{layer}.bias"] = torch.from_numpy(
                    np.asarray(node["bias"], dtype=np.float32).copy()
                )
    return sd


def torch_state_dict_to_params(sd) -> dict:
    """torch-layout state_dict -> flax params tree."""
    import jax.numpy as jnp

    def arr(key):
        v = sd[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, jnp.float32)

    p: dict[str, Any] = {}
    for side, torch_name in (
        ("dft_analysis", "conv_analysis"),
        ("dft_synthesis", "conv_synthesis"),
    ):
        p[side] = {
            f"w_{part}": arr(f"mpaec.{side}.{torch_name}_{part}.weight")[:, 0, :]
            for part in ("real", "imag")
        }
    for ae in ("aenc", "phs_aenc"):
        p[ae] = {}
        for layer in _AE_LAYERS:
            entry = {"kernel": arr(f"mpaec.{ae}.{layer}.weight").T}
            bias_key = f"mpaec.{ae}.{layer}.bias"
            if bias_key in sd:
                entry["bias"] = arr(bias_key)
            p[ae][layer] = entry
    return {"params": p}


def save_checkpoint(
    checkpointname: str,
    params,
    spec,
    effect,
    epoch: int,
    optax_state=None,
    step: int = 0,
):
    """Write a reference-schema .tar checkpoint (misc.py:21-35)."""
    import torch

    print(f"\nsaving model to {checkpointname}", end="")
    state = {
        "epoch": epoch + 1,
        "state_dict": params_to_torch_state_dict(params),
        "optimizer": {},  # schema slot; reference never restores it either
        "effect_name": effect.name,
        "knob_names": effect.knob_names,
        "knob_ranges": np.asarray(effect.knob_ranges),
        "scale_factor": spec.scale_factor,
        "shrink_factor": spec.shrink_factor,
        "in_chunk_size": spec.in_chunk_size,
        "out_chunk_size": spec.out_chunk_size,
        "sr": spec.sr,
    }
    if optax_state is not None:
        leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(optax_state)]
        state["optax_state"] = leaves
        state["optax_step"] = step
    torch.save(state, checkpointname)


def load_checkpoint(checkpointname: str, fatal: bool = False):
    """Load a checkpoint if it exists; returns (params_or_None, run_values).

    run_values carries the metadata (with the reference's backward-compat
    defaults, misc.py:50-57) plus 'optax_state'/'optax_step' when present.
    """
    rv: dict[str, Any] = {}
    if not os.path.isfile(checkpointname):
        if fatal:
            print("Error, no checkpoint found")
            sys.exit(1)
        return None, rv

    import torch

    print("\n***** Checkpoint file found. Loading weights.")
    checkpoint = torch.load(checkpointname, map_location="cpu", weights_only=False)

    rv.setdefault("sr", 44100)
    rv.setdefault("scale_factor", 1)
    rv.setdefault("shrink_factor", 4)
    rv.setdefault("in_chunk_size", 8192)
    rv.setdefault("out_chunk_size", 2048)
    rv.setdefault("knob_names", ["thresh", "ratio", "attackTime", "releaseTime"])
    rv.setdefault(
        "knob_ranges", np.array([[-30, 0], [1, 5], [1e-3, 4e-2], [1e-3, 4e-2]])
    )
    for key, value in checkpoint.items():
        if "state_dict" not in key:
            rv[key] = value

    params = torch_state_dict_to_params(checkpoint["state_dict"])
    return params, rv


def restore_optax_state(template_state, leaves):
    """Rebuild an optax state pytree from saved numpy leaves."""
    treedef = jax.tree_util.tree_structure(template_state)
    template_leaves = jax.tree_util.tree_leaves(template_state)
    assert len(template_leaves) == len(leaves), "optimizer state shape mismatch"
    import jax.numpy as jnp

    new_leaves = [
        jnp.asarray(saved, dtype=tmpl.dtype).reshape(tmpl.shape)
        if hasattr(tmpl, "shape")
        else type(tmpl)(saved)
        for tmpl, saved in zip(template_leaves, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# ----------------------------------------------------------------- orbax

def save_checkpoint_orbax(ckpt_dir: str, params, spec, effect, epoch: int,
                          optax_state=None, step: int = 0):
    """Orbax-backed checkpoint (async-capable, sharding-aware production
    format). Same metadata payload as the .tar schema; use for large-scale
    runs, keep .tar for reference interchange."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
        if optax_state is not None:
            leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(optax_state)]
            ckptr.save(
                os.path.join(path, "opt_state"),
                {str(i): v for i, v in enumerate(leaves)},
                force=True,
            )
    meta = {
        "epoch": epoch + 1,
        "effect_name": effect.name,
        "knob_names": list(effect.knob_names),
        "knob_ranges": np.asarray(effect.knob_ranges).tolist(),
        "scale_factor": spec.scale_factor,
        "shrink_factor": spec.shrink_factor,
        "in_chunk_size": spec.in_chunk_size,
        "out_chunk_size": spec.out_chunk_size,
        "sr": spec.sr,
        "optax_step": step,
    }
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_checkpoint_orbax(ckpt_dir: str):
    """Load an orbax checkpoint dir -> (params, run_values)."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    with open(os.path.join(path, "metadata.json")) as f:
        rv = json.load(f)
    rv["knob_ranges"] = np.array(rv["knob_ranges"])
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, "params"))
        opt_dir = os.path.join(path, "opt_state")
        if os.path.isdir(opt_dir):
            d = ckptr.restore(opt_dir)
            rv["optax_state"] = [d[str(i)] for i in range(len(d))]
    return params, rv
