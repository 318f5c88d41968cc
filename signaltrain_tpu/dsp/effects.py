"""Audio effect "plugins": knob-conditioned, jittable signal transforms.

Mirrors the reference's Effect class family (audio.py:449-672): each effect
declares knob_names / knob_ranges (world-coordinate min/max) / is_inverse and
implements go_wc(x, knobs_wc, key) -> (y, x). go() converts normalized
[-0.5, 0.5] knob vectors to world coordinates first.

TPU-first: go/go_wc are pure jax functions of traced (x, knobs, key), so a
whole training batch of effects runs vmapped inside the jitted train step —
the role numba-compiled kernels + 10 dataloader worker processes play in the
reference. Host code (gen_dataset) calls the same functions on numpy arrays.
"""

from __future__ import annotations

import ast
import configparser
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import compressors, iir, pitch, synths


class Effect:
    """Generic effect super-class (audio.py:449-480)."""

    def __init__(self, sr: float = 44100.0):
        self.name = "Generic Effect"
        self.knob_names = ["knob"]
        self.knob_ranges = np.array([[0.0, 1.0]], dtype=np.float32)
        self.sr = sr
        self.is_inverse = False

    @property
    def num_knobs(self) -> int:
        return len(self.knob_names)

    def knobs_wc(self, knobs_nn):
        """Normalized [-0.5, 0.5] -> world coordinates (audio.py:462-463)."""
        kr = jnp.asarray(self.knob_ranges)
        return kr[:, 0] + (jnp.asarray(knobs_nn) + 0.5) * (kr[:, 1] - kr[:, 0])

    def info(self):
        assert len(self.knob_names) == len(self.knob_ranges)
        print(f"Effect: {self.name}.  Knobs:")
        for i, kn in enumerate(self.knob_names):
            print(f"    {kn}: {self.knob_ranges[i][0]} to {self.knob_ranges[i][1]}")
        if self.is_inverse:
            print("    <<<< INVERSE EFFECT <<<<")

    def go_wc(self, x, knobs_wc, key=None):
        raise NotImplementedError("This effect's go_wc() is undefined")

    def go(self, x, knobs_nn, key=None):
        """Main training/inference interface (audio.py:477-480)."""
        return self.go_wc(x, self.knobs_wc(knobs_nn), key=key)

    def go_batch(self, x, knobs_nn, keys=None):
        """Batched interface: x (B, N), knobs_nn (B, K), keys (B, 2) or None.

        Default falls back to vmap over go(); compressor subclasses override
        with natively-batched kernels so the Pallas envelope smoother sees
        the whole batch at once (the fused-training hot path).
        """
        if keys is None:
            return jax.vmap(lambda xi, ki: self.go(xi, ki))(x, knobs_nn)
        return jax.vmap(lambda xi, ki, ky: self.go(xi, ki, key=ky))(x, knobs_nn, keys)

    def _knobs_wc_batch(self, knobs_nn):
        kr = jnp.asarray(self.knob_ranges)
        return kr[None, :, 0] + (jnp.asarray(knobs_nn) + 0.5) * (
            kr[None, :, 1] - kr[None, :, 0]
        )


class Compressor(Effect):
    """3-knob compressor w/ butterworth envelope (audio.py:484-491)."""

    def __init__(self, sr: float = 44100.0):
        super().__init__(sr)
        self.name = "Compressor"
        self.knob_names = ["threshold", "ratio", "attackreleaseTime"]
        self.knob_ranges = np.array([[-30, 0], [1, 5], [1e-3, 4e-2]], dtype=np.float32)

    def go_wc(self, x, knobs_wc, key=None):
        y = compressors.compressor(
            x, thresh=knobs_wc[0], ratio=knobs_wc[1], attackrel=knobs_wc[2], sr=self.sr
        )
        return y, x

    def go_batch(self, x, knobs_nn, keys=None):
        wc = self._knobs_wc_batch(knobs_nn)
        y = compressors.compressor(
            x, thresh=wc[:, 0], ratio=wc[:, 1], attackrel=wc[:, 2], sr=self.sr
        )
        return y, x


class Compressor_4c(Effect):
    """The flagship 4-knob compressor (audio.py:493-500)."""

    def __init__(self, sr: float = 44100.0):
        super().__init__(sr)
        self.name = "Compressor_4c"
        self.knob_names = ["threshold", "ratio", "attackTime", "releaseTime"]
        self.knob_ranges = np.array(
            [[-30, 0], [1, 5], [1e-3, 4e-2], [1e-3, 4e-2]], dtype=np.float32
        )

    def go_wc(self, x, knobs_wc, key=None):
        y = compressors.compressor_4controls(
            x,
            thresh=knobs_wc[0],
            ratio=knobs_wc[1],
            attack_time=knobs_wc[2],
            release_time=knobs_wc[3],
            sr=self.sr,
        )
        return y, x

    def go_batch(self, x, knobs_nn, keys=None):
        wc = self._knobs_wc_batch(knobs_nn)
        y = compressors.compressor_4controls(
            x,
            thresh=wc[:, 0],
            ratio=wc[:, 1],
            attack_time=wc[:, 2],
            release_time=wc[:, 3],
            sr=self.sr,
        )
        return y, x


class Compressor_4c_Large(Compressor_4c):
    """Wider knob ranges (audio.py:503-510)."""

    def __init__(self, sr: float = 44100.0):
        super().__init__(sr)
        self.name = "Compressor_4c_Large"
        self.knob_ranges = np.array(
            [[-50, 0], [1.5, 10], [1e-3, 1], [1e-3, 1]], dtype=np.float32
        )


class Comp_Just_Thresh(Effect):
    """1-knob compressor for LA2A comparison (audio.py:513-526)."""

    def __init__(self, sr: float = 44100.0):
        super().__init__(sr)
        self.name = "Comp_Just_Thresh"
        self.knob_names = ["threshold"]
        self.knob_ranges = np.array([[-50, -10]], dtype=np.float32)
        self.ratio = 3.0
        self.attack = 0.05
        self.release = 1.0

    def go_wc(self, x, knobs_wc, key=None):
        y = compressors.compressor_4controls(
            x,
            thresh=knobs_wc[0],
            ratio=self.ratio,
            attack_time=self.attack,
            release_time=self.release,
            sr=self.sr,
        )
        return y, x

    def go_batch(self, x, knobs_nn, keys=None):
        wc = self._knobs_wc_batch(knobs_nn)
        y = compressors.compressor_4controls(
            x,
            thresh=wc[:, 0],
            ratio=self.ratio,
            attack_time=self.attack,
            release_time=self.release,
            sr=self.sr,
        )
        return y, x


class Compressor_4c_OneSetting(Compressor_4c):
    """4-knob compressor locked to one setting (audio.py:529-536)."""

    def __init__(self, sr: float = 44100.0):
        super().__init__(sr)
        self.name = "Compressor_4c_OneSetting"
        self.knob_ranges = np.array(
            [[-25.001, -25.0], [4, 4.001], [5e-3, 5.001e-3], [2e-2, 2.001e-2]],
            dtype=np.float32,
        )


class Echo(Effect):
    """Delay/echo (audio.py:539-547)."""

    def __init__(self, sr: float = 44100.0):
        super().__init__(sr)
        self.name = "Echo"
        self.knob_names = ["delay_samples", "ratio", "echoes"]
        self.knob_ranges = np.array([[400, 400], [0.4, 1.0], [2, 2]], dtype=np.float32)

    def go_wc(self, x, knobs_wc, key=None):
        max_echoes = int(np.ceil(float(self.knob_ranges[2, 1])))
        y = compressors.echo(
            x,
            delay_samples=jnp.round(knobs_wc[0]),
            ratio=knobs_wc[1],
            echoes=knobs_wc[2],
            max_echoes=max_echoes,
        )
        return y, x


class PitchShifter(Effect):
    """Semitone pitch shift via phase-vocoder + resample (audio.py:549-556;
    the reference shells out to librosa — here it is native jax)."""

    def __init__(self, sr: float = 44100.0):
        super().__init__(sr)
        self.name = "PitchShifter"
        self.knob_names = ["n_steps"]
        self.knob_ranges = np.array([[-12, 12]], dtype=np.float32)

    def go_wc(self, x, knobs_wc, key=None):
        return pitch.pitch_shift(x, self.sr, knobs_wc[0]), x


class Denoise(Effect):
    """Adds tunable noise to the input and swaps x/y so the network learns
    to denoise (audio.py:558-571)."""

    def __init__(self, sr: float = 44100.0):
        super().__init__(sr)
        self.name = "Denoise"
        self.knob_names = ["strength"]
        self.knob_ranges = np.array([[0.0, 0.5]], dtype=np.float32)
        self.is_inverse = True

    def go_wc(self, x, knobs_wc, key=None):
        if key is None:
            raise ValueError("Denoise.go_wc requires a PRNG key")
        noise = knobs_wc[0] * (2.0 * jax.random.uniform(key, x.shape) - 1.0)
        return x, x + noise


class DeCompressor_4c(Effect):
    """Inverse compressor: learn to undo compression (audio.py:573-583)."""

    def __init__(self, sr: float = 44100.0):
        super().__init__(sr)
        sub = Compressor_4c(sr)
        self.name = "DeCompressor_4c"
        self.knob_names = sub.knob_names
        self.knob_ranges = sub.knob_ranges
        self.is_inverse = True

    def go_wc(self, x, knobs_wc, key=None):
        y = compressors.compressor_4controls(
            x,
            thresh=knobs_wc[0],
            ratio=knobs_wc[1],
            attack_time=knobs_wc[2],
            release_time=knobs_wc[3],
        )
        return x, y  # swapped

    def go_batch(self, x, knobs_nn, keys=None):
        wc = self._knobs_wc_batch(knobs_nn)
        y = compressors.compressor_4controls(
            x, thresh=wc[:, 0], ratio=wc[:, 1],
            attack_time=wc[:, 2], release_time=wc[:, 3],
        )
        return x, y


class TimeAlign(Effect):
    """Ignores x; re-synthesizes a centered onset signal and emits a randomly
    shifted copy as the input (audio.py:585-607)."""

    def __init__(self, sr: float = 44100.0, chunk_size: int = 4096):
        super().__init__(sr)
        self.name = "TimeAlign"
        self.knob_names = ["strength"]
        self.knob_ranges = np.array([[0.001, 0.5]], dtype=np.float32)
        self.is_inverse = True
        # chunk_size kept for API parity with the reference's hardcoded 4096
        # (audio.py:596 "TODO un-hardcode this"); synthesis below follows the
        # actual input length so any model geometry works.
        del chunk_size

    def go_wc(self, x, knobs_wc, key=None):
        if key is None:
            raise ValueError("TimeAlign.go_wc requires a PRNG key")
        k_choose, k_shift, k_synth = jax.random.split(key, 3)
        chooser = synths.choose_from(k_choose, (2, 4, 6, 7))
        t = jnp.arange(x.shape[-1], dtype=jnp.float32) / self.sr
        y = synths.synth_input_sample(k_synth, t, chooser, t0_fac=0.5)
        n = x.shape[-1]
        shift = (
            n * knobs_wc[0] * (2.0 * jax.random.uniform(k_shift) - 1.0)
        ).astype(jnp.int32)
        # roll + zero the wrapped region == shift with zero fill
        idx = jnp.arange(y.shape[-1]) - shift
        x_shift = jnp.where(
            (idx >= 0) & (idx < y.shape[-1]), y[jnp.clip(idx, 0, y.shape[-1] - 1)], 0.0
        )
        return y, x_shift


class LowPass(Effect):
    """3rd-order butterworth low-pass (audio.py:610-625)."""

    def __init__(self, sr: float = 44100.0):
        super().__init__(sr)
        self.name = "LowPass"
        self.knob_names = ["cutoff"]
        self.knob_ranges = np.array([[10, 2000]], dtype=np.float32)

    def go_wc(self, x, knobs_wc, key=None, order: int = 3):
        nyq = 0.5 * self.sr
        b, a = iir.butter_lowpass(order, knobs_wc[0] / nyq)
        return iir.lfilter(b, a, x), x

    def go_batch(self, x, knobs_nn, keys=None, order: int = 3):
        wc = self._knobs_wc_batch(knobs_nn)
        nyq = 0.5 * self.sr
        b, a = jax.vmap(lambda w: iir.butter_lowpass(order, w))(wc[:, 0] / nyq)
        return iir.lfilter(b, a, x), x


class FileEffect(Effect):
    """Metadata-only effect describing a pre-recorded file dataset
    (audio.py:628-670). Requires <path>/effect_info.ini plus Train/ and Val/
    subdirs with target_* files."""

    def __init__(self, path: str, sr: float = 44100.0):
        super().__init__(sr)
        print("  FileEffect: path = ", path)
        if (
            (path is None)
            or (not glob.glob(os.path.join(path, "Train", "target*")))
            or (not glob.glob(os.path.join(path, "Val", "target*")))
            or (not glob.glob(os.path.join(path, "effect_info.ini")))
        ):
            raise FileNotFoundError(
                f"can't find target output files or effect_info.ini in path = {path}"
            )
        config = configparser.ConfigParser()
        config.read(os.path.join(path, "effect_info.ini"))
        self.name = config["effect"]["name"] + "(files)"
        # literal_eval, not eval: same .ini format, without the reference's
        # arbitrary-code-execution smell (audio.py:661-663).
        self.knob_names = ast.literal_eval(config.get("effect", "knob_names"))
        self.knob_ranges = np.array(
            ast.literal_eval(config.get("effect", "knob_ranges")), dtype=np.float32
        )
        try:
            if bool(config["effect"]["inverse"]):
                self.is_inverse = True
                self.name = "De-" + self.name
        except KeyError:
            pass

    def go_wc(self, x, knobs_wc, key=None):
        return None  # audio comes from files; nothing to run


# Registry: the effect names accepted by the CLIs
# (run_train.py:55-80, gen_dataset.py:165-177, utils/predict_long.py:180-204).
EFFECTS = {
    "comp": Compressor,
    "comp_4c": Compressor_4c,
    "comp_4c_large": Compressor_4c_Large,
    "comp_large": Compressor_4c_Large,
    "comp_t": Comp_Just_Thresh,
    "comp_one": Compressor_4c_OneSetting,
    "echo": Echo,
    "pitch": PitchShifter,
    "denoise": Denoise,
    "decomp_4c": DeCompressor_4c,
    "timealign": TimeAlign,
    "lowpass": LowPass,
}


def make_effect(name: str, path: str | None = None, sr: float = 44100.0) -> Effect:
    """Construct an effect by CLI name; 'files' builds a FileEffect over path."""
    if name == "files":
        return FileEffect(path, sr=sr)
    if name not in EFFECTS:
        raise ValueError(f"Effect option '{name}' is not yet added")
    return EFFECTS[name](sr=sr)
