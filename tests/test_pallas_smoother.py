"""Tests for the Pallas switched one-pole smoother kernel.

The real kernel (layout, grid, carry, custom_partitioning) is exercised on
CPU through the Pallas interpreter (interpret=True / FORCE_INTERPRET), so the
exact code path that runs on TPU — minus Mosaic codegen — is what's pinned
here. Oracles: the lax.scan implementation (dsp/iir.py, itself pinned against
the C++ oracle and the reference numba loop in test_native_oracle.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from signaltrain_tpu.dsp import iir
from signaltrain_tpu.ops import pallas_kernels as pk


def _case(b, n, seed=0):
    rng = np.random.default_rng(seed)
    g = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
    aa = jnp.asarray(rng.uniform(0.9, 0.999, size=(b,)).astype(np.float32))
    ar = jnp.asarray(rng.uniform(0.9, 0.999, size=(b,)).astype(np.float32))
    return g, aa, ar


@pytest.mark.parametrize(
    "b,n",
    [
        (1, 8),        # minimum
        (3, 50),       # unaligned both dims
        (200, 1000),   # flagship-y batch
        (1100, 40),    # > 1024 slots: wide (16, 128) carry, single pass
        (2100, 40),    # wide (32, 128) carry
        (4200, 24),    # > _MAX_WIDE*128 slots: multi-tile grid (two passes)
        (16, 1200),    # > one _UNROLL-block, multiple time blocks when small
        # EXACT tile fits (b == b_pad, n == n_pad): zero-width padding must
        # not trace to an empty-index scatter const — custom_partitioning
        # rejects trace consts, so these batch sizes crashed the whole train
        # step before the round-5 fix (found by the batch-1024 lane sweep).
        (1024, 40),    # sub 8,  1 tile, exact
        (2048, 40),    # sub 16, 1 tile, exact
        (4096, 40),    # sub 32, 1 tile, exact
    ],
)
def test_kernel_matches_scan(b, n):
    g, aa, ar = _case(b, n, seed=b * 1000 + n)
    want = jax.vmap(iir.switched_one_pole)(g, aa, ar)
    got = pk.switched_one_pole_batched(g, aa, ar, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_kernel_long_signal_multiple_time_blocks():
    # n > _T_BLOCK so the carry must cross grid steps through the scratch.
    n = pk._T_BLOCK * 2 + 137
    g, aa, ar = _case(4, n, seed=7)
    want = jax.vmap(iir.switched_one_pole)(g, aa, ar)
    got = pk.switched_one_pole_batched(g, aa, ar, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_gspmd_partitions_batch_no_allgather():
    """Under GSPMD with batch sharded over 'data', the custom_partitioning
    rule must keep the kernel per-shard: no all-gather in the compiled HLO
    and bit-exact results (VERDICT r1 item 3)."""
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("data", "model"))
    b, n = 64, 512
    g, aa, ar = _case(b, n, seed=3)
    g = jax.device_put(g, NamedSharding(mesh, P("data", None)))
    aa = jax.device_put(aa, NamedSharding(mesh, P("data")))
    ar = jax.device_put(ar, NamedSharding(mesh, P("data")))

    @jax.jit
    def f(g, aa, ar):
        return pk.switched_one_pole_batched(g, aa, ar, interpret=True) * 2.0

    hlo = f.lower(g, aa, ar).compile().as_text()
    assert "all-gather" not in hlo, "smoother was gathered under GSPMD"

    out = f(g, aa, ar)
    assert out.sharding.spec[0] == "data"
    want = jax.vmap(iir.switched_one_pole)(g, aa, ar) * 2.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_kernel_inside_shard_map():
    """The shard_map DP training path calls the kernel on local shards."""
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    b, n = 16, 200
    g, aa, ar = _case(b, n, seed=5)

    def local(g, aa, ar):
        return pk.switched_one_pole_batched(g, aa, ar, interpret=True)

    f = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
            out_specs=P("data"), check_vma=False,
        )
    )
    want = jax.vmap(iir.switched_one_pole)(g, aa, ar)
    np.testing.assert_allclose(np.asarray(f(g, aa, ar)), np.asarray(want), atol=1e-6)


class TestCustomVmapRule:
    """Direct coverage of the custom_vmap batching rule (ADVICE r3): the
    ST_TPU_HOIST_DATAGEN path vmaps whole-batch datagen over the inner-step
    group axis, so the rule's flatten-run-reshape must be exact for every
    batched/unbatched operand combination, non-zero in_axes, and nesting.
    Oracle: scan-based smoother under the same vmap structure."""

    def _want(self, in_axes, g, aa, ar):
        return jax.vmap(jax.vmap(iir.switched_one_pole), in_axes=in_axes)(g, aa, ar)

    def test_all_operands_batched(self):
        g, aa, ar = _case(4, 64, seed=21)
        G = jnp.stack([g, g * 2, g - 1], axis=0)          # (3, 4, 64)
        AA = jnp.stack([aa, aa * 0.99, aa * 1.001], axis=0)
        AR = jnp.stack([ar, ar * 1.001, ar * 0.99], axis=0)
        got = jax.vmap(lambda a, b, c: pk.switched_one_pole_batched(a, b, c, interpret=True))(G, AA, AR)
        np.testing.assert_allclose(np.asarray(got), np.asarray(self._want((0, 0, 0), G, AA, AR)), atol=1e-6)

    def test_g_only_batched(self):
        g, aa, ar = _case(4, 64, seed=22)
        G = jnp.stack([g, g * 0.5, -g], axis=0)           # (3, 4, 64)
        got = jax.vmap(
            lambda a: pk.switched_one_pole_batched(a, aa, ar, interpret=True)
        )(G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(self._want((0, None, None), G, aa, ar)), atol=1e-6)

    def test_alphas_only_batched(self):
        g, aa, ar = _case(4, 64, seed=23)
        AA = jnp.stack([aa, aa * 0.99], axis=0)           # (2, 4)
        AR = jnp.stack([ar, ar * 1.001], axis=0)
        got = jax.vmap(
            lambda b, c: pk.switched_one_pole_batched(g, b, c, interpret=True),
        )(AA, AR)
        np.testing.assert_allclose(np.asarray(got), np.asarray(self._want((None, 0, 0), g, AA, AR)), atol=1e-6)

    def test_nonzero_in_axes(self):
        g, aa, ar = _case(4, 64, seed=24)
        G = jnp.stack([g, g * 2, g - 1], axis=1)          # (4, 3, 64): mapped axis 1
        got = jax.vmap(
            lambda a: pk.switched_one_pole_batched(a, aa, ar, interpret=True),
            in_axes=1, out_axes=1,
        )(G)
        want = jax.vmap(
            lambda a: jax.vmap(iir.switched_one_pole)(a, aa, ar),
            in_axes=1, out_axes=1,
        )(G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_nested_vmap(self):
        g, aa, ar = _case(4, 48, seed=25)
        G = jnp.reshape(jnp.stack([g * s for s in (1.0, 0.5, 2.0, -1.0, 0.25, 3.0)]), (2, 3, 4, 48))
        got = jax.vmap(jax.vmap(
            lambda a: pk.switched_one_pole_batched(a, aa, ar, interpret=True)
        ))(G)
        want = jax.vmap(jax.vmap(
            lambda a: jax.vmap(iir.switched_one_pole)(a, aa, ar)
        ))(G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_compressor_force_interpret_matches_scan_path():
    """compressor_4controls with the kernel forced on matches the scan path —
    the full effect chain through the real kernel."""
    from signaltrain_tpu.dsp import compressors

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(6, 300)).astype(np.float32)) * 0.5
    th = jnp.asarray(rng.uniform(-30, 0, size=(6,)).astype(np.float32))
    ra = jnp.asarray(rng.uniform(1, 5, size=(6,)).astype(np.float32))
    at = jnp.asarray(rng.uniform(1e-3, 4e-2, size=(6,)).astype(np.float32))
    re = jnp.asarray(rng.uniform(1e-3, 4e-2, size=(6,)).astype(np.float32))

    want = compressors.compressor_4controls(x, th, ra, at, re)
    pk.FORCE_INTERPRET = True
    try:
        got = compressors.compressor_4controls(x, th, ra, at, re)
    finally:
        pk.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
