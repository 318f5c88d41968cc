"""JAX DSP kernels vs the native C++ oracle (native/compressor_oracle.cpp)."""

import jax.numpy as jnp
import numpy as np

from signaltrain_tpu.dsp import compressors
from signaltrain_tpu.utils import native


def test_compressor_4c_vs_cpp_oracle():
    rs = np.random.RandomState(0)
    x = (rs.randn(8192) * 0.4).astype(np.float32)
    for th, r, at, rt in [(-24, 2, 0.01, 0.01), (-5, 5, 1e-3, 4e-2), (-30, 1.2, 0.04, 0.002)]:
        ours = np.asarray(
            compressors.compressor_4controls(jnp.asarray(x), th, r, at, rt)
        )
        oracle = native.compressor_4controls(x, th, r, at, rt)
        np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_compressor_3knob_vs_cpp_oracle():
    rs = np.random.RandomState(1)
    x = (rs.randn(8192) * 0.4).astype(np.float32)
    ours = np.asarray(compressors.compressor(jnp.asarray(x), -24.0, 2.0, 0.045))
    oracle = native.compressor_3knob(x, -24.0, 2.0, 0.045)
    np.testing.assert_allclose(ours, oracle, atol=2e-4)


def test_switched_one_pole_vs_cpp_oracle():
    rs = np.random.RandomState(2)
    g = (rs.randn(5000) * 8).astype(np.float32)
    from signaltrain_tpu.dsp.iir import switched_one_pole

    ours = np.asarray(switched_one_pole(jnp.asarray(g), 0.93, 0.997))
    oracle = native.switched_one_pole(g, 0.93, 0.997)
    np.testing.assert_allclose(ours, oracle, atol=5e-5)  # f32 vs f64 recursion
