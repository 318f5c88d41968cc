"""Window functions and Fourier bases for the trainable STFT front-end.

These are *initializers*: the analysis/synthesis transforms are trainable
parameters that start at (windowed) orthonormal-DFT matrices and drift during
training. Semantics match the reference front-end construction
(reference: signaltrain/cls_fe_dft.py:36-48, 87-100, 133-163), re-derived here
from the underlying math (Hamming window, ortho DFT, Griffin-Lim LSEE-MSTFT
synthesis window) rather than translated.

Everything here runs once at model-build time on the host, so plain numpy is
the right tool (no jit).
"""

from __future__ import annotations

import numpy as np


def hamming(n: int) -> np.ndarray:
    """Symmetric Hamming window, w[k] = 0.54 - 0.46 cos(2 pi k / (n-1)).

    Matches numpy/scipy's symmetric hamming used by the reference
    (cls_fe_dft.py:38,148).
    """
    k = np.arange(n)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * k / (n - 1))


def dft_basis(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Orthonormal DFT basis matrices (real, imag), each (n, n).

    Row ``c`` is the length-``n`` complex exponential at bin ``c`` scaled by
    1/sqrt(n):  real[c, k] = cos(2 pi c k / n) / sqrt(n),
                imag[c, k] = -sin(2 pi c k / n) / sqrt(n).
    Equivalent to ``np.fft.fft(np.eye(n), norm='ortho')`` split into real and
    imaginary parts (cls_fe_dft.py:37).
    """
    c = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    ang = 2.0 * np.pi * c * k / n
    scale = 1.0 / np.sqrt(n)
    return np.cos(ang) * scale, -np.sin(ang) * scale


def gla_synthesis_window(wsz: int, hop: int) -> np.ndarray:
    """Griffin-Lim LSEE-MSTFT synthesis window.

    The least-squares-optimal synthesis window for a Hamming analysis window
    at the given hop: w_syn = w / sum_k shift(w^2, k*hop), where the sum runs
    over all hop-shifts of the squared window that land inside [0, wsz).

    Reference computes the same quantity with a shifted-index accumulation
    loop (cls_fe_dft.py:133-163); here we express it directly as the
    overlap-added squared-window envelope.
    """
    w = hamming(wsz)
    w2 = w * w
    env = np.zeros(wsz)
    redundancy = wsz // hop
    idx = np.arange(wsz)
    for k in range(-redundancy, redundancy + 1):
        # squared window shifted by k*hop; sample positions that stay in range
        src = idx - k * hop
        valid = (src >= 0) & (src < wsz)
        env[idx[valid]] += w2[src[valid]]
    return w / env


def analysis_init(ft_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Initial analysis weights: Hamming-windowed ortho-DFT rows, (ft, ft) each.

    Row c = basis row c elementwise-times the window (cls_fe_dft.py:36-41).
    """
    re, im = dft_basis(ft_size)
    w = hamming(ft_size)
    return (re * w).astype(np.float32), (im * w).astype(np.float32)


def synthesis_init(ft_size: int, hop_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Initial synthesis weights: GLA-windowed ortho-DFT rows, (ft, ft) each.

    Row c = basis row c elementwise-times the LSEE-MSTFT synthesis window
    (cls_fe_dft.py:87-92).
    """
    re, im = dft_basis(ft_size)
    w = gla_synthesis_window(ft_size, hop_size)
    return (re * w).astype(np.float32), (im * w).astype(np.float32)
