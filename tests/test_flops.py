"""The analytic model-FLOPs count (utils/flops.py) is pinned against XLA's
own cost analysis of the compiled forward: the analytic GEMM count must
capture essentially all of what XLA counts (the remainder is elementwise /
trig VPU work). This keeps the bench's MFU figure honest — a geometry change
that invalidated the closed-form count would fail here."""

import jax
import jax.numpy as jnp
import numpy as np

from signaltrain_tpu.models.st_model import st_model
from signaltrain_tpu.utils import flops


def _xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def test_forward_flops_match_xla_cost_analysis():
    model = st_model(num_knobs=4, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    B = 16
    x = jnp.zeros((B, model.spec.in_chunk_size), jnp.float32)
    knobs = jnp.zeros((B, 4), jnp.float32)

    def fwd(p, x, knobs):
        y, _, _ = model.module.apply(p, x, knobs)
        return y

    got = _xla_flops(fwd, params, x, knobs)
    analytic = B * flops.forward_gemm_flops_per_example(model.spec)
    # XLA counts the GEMMs plus elementwise/transcendental leftovers; the
    # analytic GEMM count must be a (tight) lower bound
    assert analytic <= got * 1.001, (analytic, got)
    assert got <= 1.25 * analytic, (analytic, got)


def test_train_step_flops_are_3x_forward():
    model = st_model(num_knobs=4)
    f = flops.forward_gemm_flops_per_example(model.spec)
    assert flops.train_step_flops_per_example(model.spec) == 3 * f
    # flagship magnitudes (docstring numbers)
    assert 8.0e7 < f < 9.5e7


def test_peak_table_and_mfu(monkeypatch):
    class Dev:
        device_kind = "TPU v5 lite"

    assert flops.peak_bf16_flops(Dev()) == 197e12

    class Unknown:
        device_kind = "FPGA x9"

    assert flops.peak_bf16_flops(Unknown()) is None
    monkeypatch.setenv("ST_TPU_PEAK_FLOPS", "1e12")
    assert flops.peak_bf16_flops(Unknown()) == 1e12
    monkeypatch.delenv("ST_TPU_PEAK_FLOPS")

    model = st_model(num_knobs=4)
    achieved, m = flops.mfu(model.spec, examples_per_sec=100_000.0, device=Dev())
    expect = flops.train_step_flops_per_example(model.spec) * 1e5
    assert achieved == expect
    np.testing.assert_allclose(m, expect / 197e12)
