"""ctypes bindings to the native oracle kernels (native/compressor_oracle.cpp).

Compiled on demand with g++ into native/build/ (pybind11 is not available in
this image; the kernels expose a C ABI instead). These are the test oracles
for the JAX/Pallas DSP kernels and a fast host path for offline tools.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB = None


def _build_and_load():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(_NATIVE_DIR, "compressor_oracle.cpp")
    build_dir = os.path.join(_NATIVE_DIR, "build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, "libcompressor_oracle.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(so)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.compressor_4controls.argtypes = [
        f32p, f32p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double,
    ]
    lib.compressor_3knob.argtypes = [
        f32p, f32p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
    ]
    lib.switched_one_pole.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
    ]
    _LIB = lib
    return lib


def compressor_4controls(x, thresh=-24.0, ratio=2.0, attack_time=0.01,
                         release_time=0.01, sr=44100.0):
    lib = _build_and_load()
    x = np.ascontiguousarray(x, np.float32)
    y = np.empty_like(x)
    lib.compressor_4controls(x, y, x.size, thresh, ratio, attack_time,
                             release_time, sr)
    return y


def compressor_3knob(x, thresh=-24.0, ratio=2.0, attackrel=0.045, sr=44100.0):
    lib = _build_and_load()
    x = np.ascontiguousarray(x, np.float32)
    y = np.empty_like(x)
    lib.compressor_3knob(x, y, x.size, thresh, ratio, attackrel, sr)
    return y


def switched_one_pole(g, alpha_a, alpha_r):
    lib = _build_and_load()
    g = np.ascontiguousarray(g, np.float32)
    s = np.empty_like(g)
    lib.switched_one_pole(g, s, g.size, alpha_a, alpha_r)
    return s
