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
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

SKIP_MODES = ("res", "sf", "")


class AsymAutoEncoder(nn.Module):
    time_frames: int = 25  # T: input STFT frames
    rank: int = 64  # R: first encoded layer width
    n_knobs: int = 4  # K
    output_frames: int = 9  # OT
    use_bias: bool = True
    dropout_rate: float = 0.0  # reference has Dropout2d(0.2), disabled by default
    compute_dtype: Any = jnp.float32

    @nn.compact
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
        r, ot = self.rank, self.output_frames
        acts = []

        # In fp32 mode force full-precision passes; the platform default
        # silently decomposes fp32 matmuls to bf16 (see ops.frontend._gemm).
        precision = (
            jax.lax.Precision.HIGHEST if self.compute_dtype == jnp.float32 else None
        )

        def dense(feats, name):
            return nn.Dense(
                feats,
                use_bias=self.use_bias,
                kernel_init=jax.nn.initializers.glorot_normal(),
                bias_init=jax.nn.initializers.zeros,
                dtype=self.compute_dtype,
                precision=precision,
                name=name,
            )

        def drop(z):
            if self.dropout_rate > 0.0:
                # Reference uses Dropout2d: whole feature rows are dropped
                # together (nn_proc.py:67,82-118).
                return nn.Dropout(
                    self.dropout_rate, broadcast_dims=(2,), deterministic=deterministic
                )(z)
            return z

        elu = jax.nn.elu
        x_input = jnp.swapaxes(x, 1, 2)  # (B, F, T): frames are features

        z = elu(dense(r, "fnn_enc")(x_input))
        if return_acts:
            acts.append(z)
        z = drop(z)
        z = elu(dense(r // 2, "fnn_enc2")(z))
        if return_acts:
            acts.append(z)
        z = drop(z)
        z = elu(dense(r // 4, "fnn_enc3")(z))
        if return_acts:
            acts.append(z)
        z = elu(dense(r // 4, "fnn_enc4")(z))
        if return_acts:
            acts.append(z)

        knobs_r = jnp.broadcast_to(
            knobs[:, None, :].astype(z.dtype), (z.shape[0], z.shape[1], knobs.shape[-1])
        )
        catted = jnp.concatenate((z, knobs_r), axis=2)
        if return_acts:
            acts.append(catted)

        z = elu(dense(r // 4, "fnn_addknobs")(catted))
        if return_acts:
            acts.append(z)
        z = elu(dense(r // 4, "fnn_dec4")(z))
        if return_acts:
            acts.append(z)
        z = elu(dense(r // 2, "fnn_dec3")(z))
        if return_acts:
            acts.append(z)
        z = drop(z)
        z = elu(dense(r, "fnn_dec2")(z))
        if return_acts:
            acts.append(z)

        dec = dense(ot, "fnn_dec")(z)
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
