"""Checkpoint -> full model reconstruction (reference: utils/ptsd2full.py).

The reference reconstructs an st_model by argspec-matching checkpoint
metadata against the model constructor; here the checkpoint's run-values map
directly onto ModelSpec fields.
"""

from __future__ import annotations

import os
import sys

from ..models.st_model import STModel, st_model
from ..training import checkpoint


def load_model(infile: str, compute_dtype=None):
    """Rebuild (model, params, run_values) from a checkpoint file (ours or a
    PyTorch reference .tar)."""
    if not os.path.isfile(infile):
        print(f"Error: file {infile} not found.")
        sys.exit(1)
    params, rv = checkpoint.load_checkpoint(infile, fatal=True)
    kwargs = dict(
        scale_factor=rv["scale_factor"],
        shrink_factor=rv["shrink_factor"],
        num_knobs=len(rv["knob_names"]),
        sr=rv["sr"],
    )
    if compute_dtype is not None:
        kwargs["compute_dtype"] = compute_dtype
    model = st_model(**kwargs)
    return model, params, rv
