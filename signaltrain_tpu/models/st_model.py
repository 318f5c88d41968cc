"""Model geometry wrapper: the public model-construction surface.

Reproduces the geometry arithmetic of the reference's st_model
(nn_proc.py:344-385):

    chunk_size      = int(8192 * scale_factor)
    out_chunk_size  = int(chunk_size / shrink_factor)
    ft, hop         = 1024, 384        ('lean' scheme: fixed; the legacy
                                        scheme scales both by scale_factor)
    T   = ceil(chunk/hop) + ceil(ft/hop)
    OT  = ceil(out_chunk/hop) + ceil(ft/hop)
    out_chunk_size  = (OT-1)*hop - ft   (re-derived; warns when it differs)

At defaults: 8192 -> 2048 samples, T=25, OT=9, 513 bins, ~4.2M params.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from .mpaec import AsymMPAEC


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static geometry + metadata of one st_model instance.

    These fields mirror the run-values bundled into reference checkpoints
    (misc.py:28-34) so checkpoints can rebuild the exact model.
    """

    scale_factor: float = 1.0
    shrink_factor: float = 4.0
    num_knobs: int = 4
    sr: int = 44100
    scale_scheme: str = "lean"
    in_chunk_size: int = 8192
    out_chunk_size: int = 2048
    ft_size: int = 1024
    hop_size: int = 384
    time_frames: int = 25
    output_time_frames: int = 9


def compute_spec(
    scale_factor: float = 1.0,
    shrink_factor: float = 4.0,
    num_knobs: int = 4,
    sr: int = 44100,
    scale_scheme: str = "lean",
) -> ModelSpec:
    chunk_size = int(8192 * scale_factor)
    out_chunk_size = int(chunk_size / shrink_factor)

    ft_size, hop_size = 1024, 384
    if scale_scheme != "lean":  # legacy O(N^2) scaling (nn_proc.py:374-376)
        ft_size = int(ft_size * scale_factor)
        hop_size = int(hop_size * scale_factor)

    t = int(math.ceil(chunk_size / float(hop_size)) + math.ceil(ft_size / float(hop_size)))
    ot = int(
        math.ceil(out_chunk_size / float(hop_size)) + math.ceil(ft_size / float(hop_size))
    )
    y_size = (ot - 1) * hop_size - ft_size
    if y_size != out_chunk_size:
        print(
            f"Warning: y_size ({y_size}) should equal out_chunk_size ({out_chunk_size})\n"
            f"    Setting out_chunk_size = y_size = {y_size}"
        )
    return ModelSpec(
        scale_factor=scale_factor,
        shrink_factor=shrink_factor,
        num_knobs=num_knobs,
        sr=sr,
        scale_scheme=scale_scheme,
        in_chunk_size=chunk_size,
        out_chunk_size=y_size,
        ft_size=ft_size,
        hop_size=hop_size,
        time_frames=t,
        output_time_frames=ot,
    )


class STModel:
    """Bundle of (spec, flax module). The generic model-construction call —
    counterpart of the reference's st_model wrapper (nn_proc.py:344-393)."""

    def __init__(self, spec: ModelSpec, compute_dtype: Any = jnp.float32,
                 dropout_rate: float = 0.0):
        self.spec = spec
        self.module = AsymMPAEC(
            expected_time_frames=spec.time_frames,
            ft_size=spec.ft_size,
            hop_size=spec.hop_size,
            n_knobs=spec.num_knobs,
            output_tf=spec.output_time_frames,
            compute_dtype=compute_dtype,
            dropout_rate=dropout_rate,
        )

    def init(self, key: jax.Array):
        x = jnp.zeros((1, self.spec.in_chunk_size), jnp.float32)
        knobs = jnp.zeros((1, self.spec.num_knobs), jnp.float32)
        return self.module.init(key, x, knobs)

    def apply(self, params, x, knobs, **kwargs):
        return self.module.apply(params, x, knobs, **kwargs)


def st_model(
    scale_factor: float = 1.0,
    shrink_factor: float = 4.0,
    num_knobs: int = 4,
    sr: int = 44100,
    scale_scheme: str = "lean",
    compute_dtype: Any = jnp.float32,
    dropout_rate: float = 0.0,
) -> STModel:
    spec = compute_spec(scale_factor, shrink_factor, num_knobs, sr, scale_scheme)
    return STModel(spec, compute_dtype=compute_dtype, dropout_rate=dropout_rate)


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
