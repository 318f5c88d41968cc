"""Audio file I/O (reference: audio.py:207-293).

scipy wavfile is the fast path, exactly as the reference; the librosa
fallback/resampler is replaced by scipy.signal.resample_poly with a Kaiser
window (librosa is not available, and polyphase resampling is the same
algorithm class as its 'kaiser_fast' mode).
"""

from __future__ import annotations

import glob
import math
import os
import warnings

import numpy as np
from scipy.io import wavfile
from scipy import signal as ssig


def resample(signal: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase Kaiser-windowed resampling."""
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = int(target_sr) // g, int(orig_sr) // g
    return ssig.resample_poly(signal, up, down, window=("kaiser", 5.0))


def read_audio_file(
    filename: str,
    sr: int = 44100,
    mono: bool = True,
    norm: bool = False,
    dtype=np.float32,
    warn: bool = True,
    fix_and_overwrite: bool = False,
):
    """Read a WAV file; convert to mono float in [-1, 1]; resample to sr if
    needed (audio.py:207-255). Returns (signal, sr)."""
    might_overwrite = False
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        read_sr, signal = wavfile.read(filename)

    if mono and signal.ndim > 1:
        signal = signal[:, 0]

    if signal.dtype == np.int16:
        signal = np.array(signal / 32767.0, dtype=dtype)
    elif signal.dtype == np.int32:
        signal = np.array(signal / 2147483647.0, dtype=dtype)
    elif signal.dtype == np.uint8:
        signal = np.array((signal.astype(np.float32) - 128.0) / 127.0, dtype=dtype)

    if read_sr != int(sr):
        if warn:
            print(
                f"read_audio_file: Got sample rate of {read_sr} Hz instead of "
                f"{sr} Hz requested. Resampling."
            )
        signal = resample(signal, read_sr, sr)
        might_overwrite = True

    if fix_and_overwrite and might_overwrite:
        print(f"    Overwriting {filename} (so we don't have to process as much again)")
        write_audio_file(filename, signal.astype(dtype, copy=False), sr)

    if signal.dtype != dtype:
        signal = signal.astype(dtype, copy=False)

    if norm:
        absmax = np.max(np.abs(signal))
        signal = signal / absmax if absmax > 0 else signal

    return signal, sr


def write_audio_file(filename: str, data, sr: int = 44100):
    """scipy wavfile write (audio.py:258-262)."""
    wavfile.write(filename, sr, np.asarray(data))


def readaudio_generator(
    seq_size: int,
    path: str = os.path.expanduser("~") + "/datasets/signaltrain/Val",
    sr: int = 44100,
    random_every: bool = True,
    mono: bool = True,
    norm: bool = False,
):
    """Random-window generator over the wav files in a directory
    (audio.py:264-293). send(True) switches to a new random file."""
    files = glob.glob(path + "*.wav")
    read_new_file = True
    start = -seq_size
    data = None
    while True:
        if read_new_file or data is None:
            filename = np.random.choice(files)
            data, sr = read_audio_file(filename, sr=sr, mono=mono, norm=norm)
            read_new_file = False
        if random_every:
            start = np.random.randint(0, data.shape[0] - seq_size)
        else:
            start += seq_size
        rc = yield data[start : start + seq_size]
        if isinstance(rc, bool):
            read_new_file = rc
