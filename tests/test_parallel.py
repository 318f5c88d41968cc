"""Sharding-policy tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from signaltrain_tpu.models.st_model import st_model
from signaltrain_tpu.parallel import mesh as meshlib


def test_mesh_shapes():
    m = meshlib.make_mesh(n_model=2)
    assert m.shape["data"] * m.shape["model"] == len(jax.devices())
    assert m.shape["model"] == 2


def test_param_shardings_front_end_on_model_axis():
    model = st_model(num_knobs=4)
    params = model.init(jax.random.PRNGKey(0))
    mesh = meshlib.make_mesh(n_model=2)
    sh = meshlib.param_shardings(mesh, params)
    placed = jax.device_put(params, sh)
    fe = placed["params"]["dft_analysis"]["w_real"]
    # front-end matrices sharded over 'model' (rows split across 2 devices)
    assert len(fe.sharding.device_set) == len(jax.devices())
    shard_shapes = {s.data.shape for s in fe.addressable_shards}
    assert shard_shapes == {(512, 1024)}
    # autoencoder params replicated
    ae = placed["params"]["aenc"]["fnn_enc"]["kernel"]
    assert {s.data.shape for s in ae.addressable_shards} == {(25, 64)}


def test_data_sharding_splits_batch():
    mesh = meshlib.make_mesh(n_model=1)
    x = jnp.zeros((16, 512))
    xs = jax.device_put(x, meshlib.data_sharding(mesh))
    assert {s.data.shape for s in xs.addressable_shards} == {(2, 512)}


def test_sharded_forward_matches_replicated():
    """dp x tp forward must produce the same numbers as single-device."""
    model = st_model(num_knobs=4)
    params = model.init(jax.random.PRNGKey(1))
    rs = np.random.RandomState(0)
    x = jnp.asarray((rs.randn(8, 8192) * 0.3).astype(np.float32))
    knobs = jnp.asarray((rs.rand(8, 4) - 0.5).astype(np.float32))

    y_ref, _, _ = model.apply(params, x, knobs)

    mesh = meshlib.make_mesh(n_model=2)
    p_sh = jax.device_put(params, meshlib.param_shardings(mesh, params))
    x_sh = jax.device_put(x, meshlib.data_sharding(mesh))
    k_sh = jax.device_put(knobs, meshlib.data_sharding(mesh))
    y_sh, _, _ = jax.jit(model.apply)(p_sh, x_sh, k_sh)

    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=2e-5)
