"""Asymmetric Magnitude-Phase AutoEncoder with knob conditioning (AsymMPAEC).

Forward math reproduces the reference exactly (nn_proc.py:305-340):

    re, im  = Analysis(x/2)                    # /2 ~ unit-variance trick
    mag     = sqrt(re^2 + im^2)
    phs     = atan2(im, re + 1e-7)             # always fp32
    mag_hat = aenc(mag, knobs; skip='sf')      # multiplicative skip-filter
    phs_hat = phs_aenc(phs, knobs; skip='') + phs[:, -OT:, :]
    wave    = Synthesis(mag_hat*cos(phs_hat), mag_hat*sin(phs_hat))
    y_hat   = 2 * (wave + x[:, -out:]/2)
    returns (y_hat, mag, mag_hat)

Mixed precision: the GEMMs (front-end + autoencoders) run in compute_dtype
(bfloat16 on TPU); magnitude/phase trigonometry is precision-sensitive and is
kept in float32 regardless (SURVEY.md §7 hard parts).

Two compute paths over the SAME parameter tree (checkpoints interchangeable):

* frontend="xla"    — the formulation above, batch-major (B, T, F) tensors.
* frontend="pallas" — the fused Pallas front-end (ops/pallas_frontend.py):
  framing + analysis GEMM + mag/phase fused into one VMEM-resident kernel,
  trig + synthesis GEMM + overlap-add fused into another, autoencoders run
  frame-major between them (no (B, F, T) slab transposes). Returns mag /
  mag_hat FRAME-MAJOR ((T, B, F) / (OT, B, F)) — calc_loss is
  layout-agnostic (training/loss.py), but return_acts consumers get the XLA
  path regardless. Parity pinned by tests/test_model.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.frontend import Analysis, Synthesis
from .autoencoder import AsymAutoEncoder


class AsymMPAEC(nn.Module):
    expected_time_frames: int
    ft_size: int = 1024
    hop_size: int = 384
    decomposition_rank: int = 64
    n_knobs: int = 4
    output_tf: int | None = None
    compute_dtype: Any = jnp.float32
    dropout_rate: float = 0.0
    frontend: str = "xla"  # "xla" | "pallas" (fused kernels)

    def setup(self):
        out_tf = self.output_tf if self.output_tf is not None else self.expected_time_frames
        self.dft_analysis = Analysis(
            ft_size=self.ft_size, hop_size=self.hop_size, compute_dtype=self.compute_dtype
        )
        self.dft_synthesis = Synthesis(
            ft_size=self.ft_size, hop_size=self.hop_size, compute_dtype=self.compute_dtype
        )
        self.aenc = AsymAutoEncoder(
            time_frames=self.expected_time_frames,
            rank=self.decomposition_rank,
            n_knobs=self.n_knobs,
            output_frames=out_tf,
            compute_dtype=self.compute_dtype,
            dropout_rate=self.dropout_rate,
        )
        self.phs_aenc = AsymAutoEncoder(
            time_frames=self.expected_time_frames,
            rank=self.decomposition_rank,
            n_knobs=self.n_knobs,
            output_frames=out_tf,
            compute_dtype=self.compute_dtype,
            dropout_rate=self.dropout_rate,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        knobs: jnp.ndarray,
        deterministic: bool = True,
        return_acts: bool = False,
    ):
        """x: (B, in_chunk) waveform; knobs: (B, K) normalized to [-0.5, 0.5]."""
        if (
            self.frontend == "pallas"
            and not return_acts
            and self.dropout_rate == 0.0
        ):
            return self._fused(x, knobs)
        x_real, x_imag = self.dft_analysis(x / 2)
        # Magnitude/phase in fp32 (atan2 in low precision wrecks phase).
        re32, im32 = x_real.astype(jnp.float32), x_imag.astype(jnp.float32)
        # Grad-safe L2: edge frames are exactly zero (they cover only the
        # ft-sample zero padding), and d/ds sqrt(s) at s=0 is inf. torch.norm
        # special-cases the zero-vector subgradient to 0 (the reference relies
        # on that, nn_proc.py:309); max() against a tiny floor reproduces it —
        # the constant branch wins at s=0, giving zero gradient, while the
        # forward value changes by at most 1e-18.
        sq = re32 * re32 + im32 * im32
        mag = jnp.sqrt(jnp.maximum(sq, 1e-36))
        phs = jnp.arctan2(im32, re32 + 1e-7)
        if return_acts:
            layer_acts = [x_real, x_imag, mag, phs]

        mag_hat, m_acts = self.aenc(
            mag, knobs, skip_connections="sf",
            deterministic=deterministic, return_acts=return_acts,
        )
        phs_hat, p_acts = self.phs_aenc(
            phs, knobs, skip_connections="",
            deterministic=deterministic, return_acts=return_acts,
        )
        if return_acts:
            layer_acts.extend(m_acts)
            layer_acts.extend(p_acts)

        output_tf = phs_hat.shape[1]
        phs_hat = phs_hat + phs[:, -output_tf:, :]  # residual phase skip

        an_real = mag_hat * jnp.cos(phs_hat)
        an_imag = mag_hat * jnp.sin(phs_hat)

        x_fwdsyn = self.dft_synthesis(an_real, an_imag)
        y_hat = x_fwdsyn + x[:, -x_fwdsyn.shape[-1] :] / 2

        if return_acts:
            layer_acts.extend([mag_hat, phs_hat, an_real, an_imag, x_fwdsyn, y_hat])
            return 2 * y_hat, mag, mag_hat, layer_acts
        return 2 * y_hat, mag, mag_hat

    def _fused(self, x: jnp.ndarray, knobs: jnp.ndarray):
        """Fused Pallas path — same math as __call__ (the /2 input scaling is
        folded into the analysis kernel; 2*(wave + x_tail/2) is expanded to
        2*wave + x_tail). mag / mag_hat come back frame-major."""
        mag, phs = self.dft_analysis.mag_phs(x)  # (T, B, half) f32 each
        mag_hat = self.aenc.frame_major(mag, knobs, skip_connections="sf")
        phs_hat = self.phs_aenc.frame_major(phs, knobs, skip_connections="")
        ot = phs_hat.shape[0]
        phs_hat = phs_hat + phs[-ot:]  # residual phase skip
        wave = self.dft_synthesis.from_mag_phs(mag_hat, phs_hat)
        y_hat = 2.0 * wave + x[:, -wave.shape[-1] :]
        return y_hat, mag, mag_hat
