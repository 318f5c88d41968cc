"""REAL multi-host execution: two OS processes under jax.distributed (gloo
collectives, 4 virtual CPU devices each -> 8 global), running the full
train() loop and a controlled train step on the global mesh.

Until round 5 the multi-host claims (SPMD discipline, primary-only writes,
jax.distributed wrapper) were tested only single-process with
process_index monkeypatched; this executes the actual cross-process path —
collectives included — and checks the step's loss against the
single-device 8-shard oracle (training/oracle.py), so the 2-host x
4-device decomposition is proven numerically equivalent to the 8-shard
program, not just alive. Reference had no distributed backend at all
(SURVEY.md §5)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(ROOT, "tests", "multihost_child.py")


@pytest.mark.slow
def test_two_process_train_and_oracle(tmp_path):
    w0, w1 = tmp_path / "p0", tmp_path / "p1"
    w0.mkdir(), w1.mkdir()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    port = "12384"
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), port, str(w)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i, w in enumerate((w0, w1))
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out[-4000:]}"

    # primary-only observability: p0 wrote the artifacts, p1 wrote nothing
    # (probe_loss is written by both by design)
    assert (w0 / "vl_avg_out.dat").exists()
    assert (w0 / "modelcheckpoint.tar").exists()
    p1_files = {f.name for f in w1.iterdir()}
    assert p1_files == {"probe_loss_p1.txt"}, p1_files

    l0 = float((w0 / "probe_loss_p0.txt").read_text())
    l1 = float((w1 / "probe_loss_p1.txt").read_text())
    assert l0 == l1  # replicated output, both ranks agree exactly

    # numerics: the 2-process x 4-device step must equal the single-device
    # oracle emulating the same 8 shards
    from signaltrain_tpu.data import synth_data
    from signaltrain_tpu.dsp import effects
    from signaltrain_tpu.models.st_model import st_model
    from signaltrain_tpu.training import oracle, train as trainlib

    effect = effects.Compressor_4c()
    model = st_model(num_knobs=4, compute_dtype=jnp.float32)
    params0 = model.init(jax.random.PRNGKey(0))
    tx, _ = trainlib.make_optimizer(1e-4, 256, 2, 16)
    batch_fn = synth_data.make_synth_batch_fn(
        effect, model.spec.in_chunk_size, model.spec.out_chunk_size
    )
    orc = oracle.make_oracle_step(model, tx, batch_fn, 16, n_data=8)
    _, _, l_orc = orc(params0, tx.init(params0), jnp.asarray(0),
                      jax.random.PRNGKey(1))
    np.testing.assert_allclose(l0, float(l_orc), rtol=2e-5)
