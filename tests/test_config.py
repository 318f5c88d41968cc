"""RunConfig: the single typed config behind run_train (VERDICT r1 item 10)."""

import argparse

import numpy as np

from signaltrain_tpu.config import RunConfig, train_from_config


def _args(**over):
    ns = argparse.Namespace(
        effect="comp_4c", path=None, target="stream", compand=False,
        epochs=3, num=1200, batch=20, lrmax=2e-4, sr=44100, scale=1.0,
        shrink=4, dtype="float32", seed=1, nmodel=1,
        checkpoint="in.tar", out_checkpoint=None,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_from_args_roundtrip():
    cfg = RunConfig.from_args(_args())
    assert cfg.effect_name == "comp_4c"
    assert cfg.n_data_points == 1200 and cfg.batch_size == 20
    # out checkpoint defaults to the in name (reference writes the same file)
    assert cfg.out_checkpointname == "in.tar"
    cfg2 = RunConfig.from_args(_args(out_checkpoint="other.tar"))
    assert cfg2.out_checkpointname == "other.tar"
    assert cfg2.in_checkpointname == "in.tar"


def test_geometry_fields_feed_model_spec():
    cfg = RunConfig.from_args(_args(scale=0.5, shrink=1))
    spec = cfg.model_spec(num_knobs=4)
    assert spec.in_chunk_size == 4096 and spec.out_chunk_size == 3968
    import jax.numpy as jnp

    assert cfg.compute_dtype() == jnp.float32


def test_train_from_config_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = RunConfig(
        effect_name="comp_t", epochs=1, n_data_points=32, batch_size=8,
        dtype="float32", make_plots=False, cp_every=1,
        out_checkpointname="cfg_out.tar", scale_factor=512 / 8192.0,
        shrink_factor=4.0,
    )
    model, params = train_from_config(cfg)
    assert (tmp_path / "cfg_out.tar").exists()
    assert model.spec.in_chunk_size == 512
    assert all(np.all(np.isfinite(np.asarray(p))) for p in
               __import__("jax").tree.leaves(params))
