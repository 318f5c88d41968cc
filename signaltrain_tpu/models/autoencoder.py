"""Knob-conditioned asymmetric autoencoder over STFT time frames.

Reproduces the architecture of the reference's AsymAutoEncoder
(nn_proc.py:28-126): nine Dense layers applied along the *time-frame* axis of
a (B, T, F) spectrogram (the array is viewed as (B, F, T) so frames are the
feature dimension), ELU activations, knob vector concatenated at the
bottleneck, Xavier-normal / zero-bias init, and a selectable output skip mode:

    'res'  : ELU(dec(z) + x[..., -OT:])          residual
    'sf'   : ELU(dec(z)) * x[..., -OT:]          multiplicative skip-filter
    ''     : ELU(dec(z))                         none

('exp' exists in the reference but slices a mismatched axis and cannot run at
the production geometry — intentionally not reproduced.)

TPU notes: each Dense is a tiny GEMM over the last axis (T=25 -> R=64 -> ...),
batched over B*F=B*513 rows — comfortably MXU-shaped once batch is large.
Computation can run in bfloat16 (params stay fp32).

Two call paths over the SAME parameter tree (checkpoint wire format is
unchanged — {fnn_enc: {kernel, bias}, ...}, see training/checkpoint.py):

* __call__   — batch-major (B, T, F), the reference layout.
* frame_major — (T, B, F) frame-major, the layout the fused Pallas STFT
  kernels emit (ops/pallas_frontend.py). The first layer contracts the
  leading frame axis directly with dot_general, so no (B, F, T) slab is ever
  materialized in HBM.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

SKIP_MODES = ("res", "sf", "")


class _Dense(nn.Module):
    """Last-axis affine layer, param-compatible with nn.Dense ({kernel,
    bias}, glorot-normal / zeros — nn_proc.py:48-58's Xavier init), declared
    setup-style so a sibling method (contract_first) can reuse the weights
    in a different contraction layout."""

    in_features: int
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    precision: Any = None

    def setup(self):
        self.kernel = self.param(
            "kernel",
            jax.nn.initializers.glorot_normal(),
            (self.in_features, self.features),
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", jax.nn.initializers.zeros, (self.features,)
            )

    def _finish(self, y):
        if self.use_bias:
            y = y + self.bias.astype(self.dtype)
        return y

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jax.lax.dot_general(
            x.astype(self.dtype),
            self.kernel.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            precision=self.precision,
        )
        return self._finish(y)

    def contract_first(self, xf: jnp.ndarray) -> jnp.ndarray:
        """(C, ...) -> (..., features): contract the LEADING axis. Same math
        as __call__ on moveaxis(xf, 0, -1) but expressed as one dot_general,
        so XLA folds the layout change into the GEMM instead of writing a
        transposed copy of the full slab to HBM."""
        y = jax.lax.dot_general(
            xf.astype(self.dtype),
            self.kernel.astype(self.dtype),
            (((0,), (0,)), ((), ())),
            precision=self.precision,
        )
        return self._finish(y)


class AsymAutoEncoder(nn.Module):
    time_frames: int = 25  # T: input STFT frames
    rank: int = 64  # R: first encoded layer width
    n_knobs: int = 4  # K
    output_frames: int = 9  # OT
    use_bias: bool = True
    dropout_rate: float = 0.0  # reference has Dropout2d(0.2), disabled by default
    compute_dtype: Any = jnp.float32

    def setup(self):
        r = self.rank
        # In fp32 mode force full-precision passes; the platform default
        # silently decomposes fp32 matmuls to bf16 (see ops.frontend._gemm).
        precision = (
            jax.lax.Precision.HIGHEST if self.compute_dtype == jnp.float32 else None
        )

        def mk(i, o):
            return _Dense(
                i, o,
                use_bias=self.use_bias,
                dtype=self.compute_dtype,
                precision=precision,
            )

        self.fnn_enc = mk(self.time_frames, r)
        self.fnn_enc2 = mk(r, r // 2)
        self.fnn_enc3 = mk(r // 2, r // 4)
        self.fnn_enc4 = mk(r // 4, r // 4)
        self.fnn_addknobs = mk(r // 4 + self.n_knobs, r // 4)
        self.fnn_dec4 = mk(r // 4, r // 4)
        self.fnn_dec3 = mk(r // 4, r // 2)
        self.fnn_dec2 = mk(r // 2, r)
        self.fnn_dec = mk(r, self.output_frames)
        if self.dropout_rate > 0.0:
            # Reference uses Dropout2d: whole feature rows are dropped
            # together (nn_proc.py:67,82-118).
            self.dropout = nn.Dropout(self.dropout_rate, broadcast_dims=(2,))

    def _knobs_cat(self, z, knobs):
        knobs_r = jnp.broadcast_to(
            knobs[:, None, :].astype(z.dtype),
            (z.shape[0], z.shape[1], knobs.shape[-1]),
        )
        return jnp.concatenate((z, knobs_r), axis=2)

    def __call__(
        self,
        x: jnp.ndarray,
        knobs: jnp.ndarray,
        skip_connections: str = "res",
        deterministic: bool = True,
        return_acts: bool = False,
    ):
        """x: (B, T, F) spectrogram slab; knobs: (B, K) in [-0.5, 0.5].

        Returns (out, acts) with out: (B, OT, F); acts is [] unless
        return_acts (used by live visualization, utils/viz.py:108-193).
        """
        if skip_connections not in SKIP_MODES:
            raise ValueError(f"unsupported skip mode {skip_connections!r}")
        ot = self.output_frames
        acts = []

        def drop(z):
            if self.dropout_rate > 0.0:
                return self.dropout(z, deterministic=deterministic)
            return z

        elu = jax.nn.elu
        x_input = jnp.swapaxes(x, 1, 2)  # (B, F, T): frames are features

        z = elu(self.fnn_enc(x_input))
        if return_acts:
            acts.append(z)
        z = drop(z)
        z = elu(self.fnn_enc2(z))
        if return_acts:
            acts.append(z)
        z = drop(z)
        z = elu(self.fnn_enc3(z))
        if return_acts:
            acts.append(z)
        z = elu(self.fnn_enc4(z))
        if return_acts:
            acts.append(z)

        catted = self._knobs_cat(z, knobs)
        if return_acts:
            acts.append(catted)

        z = elu(self.fnn_addknobs(catted))
        if return_acts:
            acts.append(z)
        z = elu(self.fnn_dec4(z))
        if return_acts:
            acts.append(z)
        z = elu(self.fnn_dec3(z))
        if return_acts:
            acts.append(z)
        z = drop(z)
        z = elu(self.fnn_dec2(z))
        if return_acts:
            acts.append(z)

        dec = self.fnn_dec(z)
        tail = x_input[:, :, -ot:]
        if skip_connections == "res":
            out = elu(dec + tail)
        elif skip_connections == "sf":
            out = elu(dec) * tail
        else:
            out = elu(dec)
        out = drop(out)
        if return_acts:
            acts.append(out)

        return jnp.swapaxes(out, 1, 2), acts  # (B, OT, F)

    def frame_major(
        self,
        xf: jnp.ndarray,
        knobs: jnp.ndarray,
        skip_connections: str = "res",
    ) -> jnp.ndarray:
        """Fused-front-end layout: xf (T, B, F) -> (OT, B, F).

        Identical math to __call__ (pinned by tests/test_model.py fused-vs-
        XLA parity); the only HBM-sized layout ops left are the two small
        (OT, B, F) transposes around the output skip. Dropout is
        unsupported here — production configs run dropout_rate=0, and the
        train step falls back to the XLA path otherwise.
        """
        if skip_connections not in SKIP_MODES:
            raise ValueError(f"unsupported skip mode {skip_connections!r}")
        if self.dropout_rate > 0.0:
            raise NotImplementedError("frame_major does not support dropout")
        ot = self.output_frames
        elu = jax.nn.elu

        z = elu(self.fnn_enc.contract_first(xf))  # (B, F, R)
        z = elu(self.fnn_enc2(z))
        z = elu(self.fnn_enc3(z))
        z = elu(self.fnn_enc4(z))
        z = elu(self.fnn_addknobs(self._knobs_cat(z, knobs)))
        z = elu(self.fnn_dec4(z))
        z = elu(self.fnn_dec3(z))
        z = elu(self.fnn_dec2(z))
        dec = self.fnn_dec(z)  # (B, F, OT)

        tail = jnp.transpose(xf[-ot:], (1, 2, 0))  # (B, F, OT), stays f32
        if skip_connections == "res":
            out = elu(dec + tail)
        elif skip_connections == "sf":
            out = elu(dec) * tail
        else:
            out = elu(dec)
        return jnp.transpose(out, (2, 0, 1))  # (OT, B, F)
