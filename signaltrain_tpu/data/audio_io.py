"""Audio file I/O (reference: audio.py:207-293).

scipy wavfile is the fast path, exactly as the reference. The reference's
non-wav fallback is librosa.core.load (audio.py:238-242), which shells out to
audioread/ffmpeg; here the fallback chain is:

1. .aif/.aiff/.aifc — a native AIFF/AIFC parser (IFF chunks, big-endian PCM,
   'sowt' little-endian AIFC, 80-bit extended-float sample rate). No external
   dependency, works everywhere.
2. anything else (.mp3/.m4a/.ogg/...) — ffmpeg subprocess decode when an
   ffmpeg binary is on PATH (the same decoder librosa ends up using).
3. otherwise — a clear error naming the formats this install can read.

The librosa resampler is replaced by scipy.signal.resample_poly with a Kaiser
window (polyphase resampling, the same algorithm class as 'kaiser_fast').
"""

from __future__ import annotations

import glob
import math
import os
import shutil
import struct
import subprocess
import warnings

import numpy as np
from scipy.io import wavfile
from scipy import signal as ssig


def _float80(b: bytes) -> float:
    """IEEE 754 extended 80-bit float (AIFF COMM sample rate)."""
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _read_aiff(filename: str):
    """Native AIFF / AIFF-C reader -> (int_samples (frames, ch), sample_rate).

    Handles 8/16/24/32-bit PCM, big-endian ('NONE') and the common
    little-endian AIFC variant ('sowt')."""
    with open(filename, "rb") as f:
        data = f.read()
    if len(data) < 12 or data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError(f"{filename}: not an AIFF/AIFC file")
    pos, end = 12, 4 + 4 + struct.unpack(">I", data[4:8])[0]
    comm = ssnd = None
    while pos + 8 <= min(end, len(data)):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError(f"{filename}: missing COMM/SSND chunk")

    n_ch, n_frames, bits = struct.unpack(">hIh", comm[:8])
    rate = _float80(comm[8:18])
    compression = comm[18:22] if len(comm) >= 22 else b"NONE"
    if compression not in (b"NONE", b"sowt"):
        raise ValueError(
            f"{filename}: unsupported AIFC compression {compression!r} "
            "(only uncompressed PCM is supported)"
        )
    offset, _blocksize = struct.unpack(">II", ssnd[:8])
    raw = ssnd[8 + offset :]

    nbytes = (bits + 7) // 8
    raw = raw[: n_frames * n_ch * nbytes]
    order = "<" if compression == b"sowt" else ">"
    if nbytes == 3:  # 24-bit: widen to int32 keeping sign
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        if order == ">":
            a = a[:, ::-1]
        samples = (
            a[:, 0].astype(np.int32)
            | (a[:, 1].astype(np.int32) << 8)
            | (a[:, 2].astype(np.int32) << 16)
        )
        samples = (samples << 8) >> 8  # sign-extend
        peak = float(2**23 - 1)
    else:
        dtype = {1: "i1", 2: f"{order}i2", 4: f"{order}i4"}[nbytes]
        samples = np.frombuffer(raw, dtype=np.dtype(dtype)).astype(np.int32)
        peak = float(2 ** (8 * nbytes - 1) - 1)
    signal = samples.astype(np.float32) / peak
    return signal.reshape(-1, n_ch), int(round(rate))


def _ffprobe_channels(filename: str) -> int | None:
    """Channel count of the first audio stream, via ffprobe (ships with
    ffmpeg). None if ffprobe is unavailable or the probe fails."""
    if not shutil.which("ffprobe"):
        return None
    proc = subprocess.run(
        [
            "ffprobe", "-v", "error", "-select_streams", "a:0",
            "-show_entries", "stream=channels", "-of", "csv=p=0", filename,
        ],
        capture_output=True,
    )
    try:
        return int(proc.stdout.decode().strip()) if proc.returncode == 0 else None
    except ValueError:
        return None


def _read_via_ffmpeg(filename: str, sr: int, mono: bool):
    """Decode any format ffmpeg knows to float32 PCM over a pipe.

    ffmpeg emits interleaved f32le; mono output stays 1-D, multichannel is
    de-interleaved to (frames, ch) like the wav/aiff readers. The channel
    count comes from ffprobe; if ffprobe is missing we force -ac 2 so the
    stream's layout is known (stereo downmix for >2-ch sources)."""
    n_ch = 1 if mono else _ffprobe_channels(filename)
    cmd = [
        "ffmpeg", "-v", "error", "-i", filename,
        "-f", "f32le", "-acodec", "pcm_f32le", "-ar", str(int(sr)),
    ]
    if mono:
        cmd += ["-ac", "1"]
    elif n_ch is None:
        n_ch = 2
        cmd += ["-ac", "2"]
    cmd += ["-"]
    proc = subprocess.run(cmd, capture_output=True)
    if proc.returncode != 0:
        raise ValueError(
            f"ffmpeg failed to decode {filename}: {proc.stderr.decode(errors='replace')}"
        )
    signal = np.frombuffer(proc.stdout, dtype=np.float32)
    if n_ch > 1:
        signal = signal[: (len(signal) // n_ch) * n_ch].reshape(-1, n_ch)
    return signal, int(sr)


def resample(signal: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase Kaiser-windowed resampling."""
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = int(target_sr) // g, int(orig_sr) // g
    return ssig.resample_poly(signal, up, down, window=("kaiser", 5.0))


def to_pcm16(a, xp=np):
    """float [-1,1] -> int16 by ROUNDING (truncation would carry a ~0.5-LSB
    bias toward zero). THE one definition of the float->int16 quantization,
    shared by gen_dataset's device/infile/host backends and predict_long's
    device-side and host-side --pcm16 paths, so the conversion can never
    desynchronize between them. xp: numpy or jax.numpy."""
    return xp.round(xp.clip(a, -1.0, 1.0) * 32767.0).astype(xp.int16)


def read_audio_file(
    filename: str,
    sr: int = 44100,
    mono: bool = True,
    norm: bool = False,
    dtype=np.float32,
    warn: bool = True,
    fix_and_overwrite: bool = False,
):
    """Read an audio file; convert to mono float in [-1, 1]; resample to sr
    if needed (audio.py:207-255). Returns (signal, sr).

    WAV rides scipy (the reference's fast path); .aif/.aiff/.aifc use the
    native AIFF parser; other formats decode through ffmpeg when available —
    the reference's librosa fallback (audio.py:238-242) — else a clear error.
    """
    might_overwrite = False
    ext = os.path.splitext(filename)[1].lower()
    if ext in (".wav", ".wave", ""):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            read_sr, signal = wavfile.read(filename)
    elif ext in (".aif", ".aiff", ".aifc"):
        signal, read_sr = _read_aiff(filename)
    elif shutil.which("ffmpeg"):
        signal, read_sr = _read_via_ffmpeg(filename, sr=sr, mono=mono)
    else:
        raise ValueError(
            f"Cannot read {filename}: this install decodes .wav and "
            f".aif/.aiff natively; for {ext!r} install ffmpeg on PATH "
            f"(the reference used librosa/audioread the same way)"
        )

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
