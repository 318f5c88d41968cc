"""Child process for tests/test_multihost.py: one rank of a 2-process
jax.distributed run (4 virtual CPU devices each -> 8 global).

Runs the FULL train() orchestration on the global 8x1 mesh (primary-only
observability), then one controlled make_train_step whose loss the parent
compares against the single-device 8-shard oracle. Not a pytest file —
invoked as `python multihost_child.py <pid> <port> <workdir>`.
"""

import os
import sys

# 4 local virtual devices per process; REPLACE any inherited count (the
# parent pytest process carries count=8 from tests/conftest.py)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=4"]
)

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.chdir(workdir)

    from signaltrain_tpu.parallel import distributed

    distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=pid,
        cluster_detection_method="deactivate",  # this jax's K8s detector is broken
        initialization_timeout=60,
    )
    assert jax.process_count() == 2 and jax.device_count() == 8

    import jax.numpy as jnp

    from signaltrain_tpu.data import synth_data
    from signaltrain_tpu.dsp import effects
    from signaltrain_tpu.models.st_model import st_model
    from signaltrain_tpu.parallel import mesh as meshlib
    from signaltrain_tpu.training import train as trainlib

    effect = effects.Compressor_4c()

    # 1) the full orchestration loop across processes: every process
    # computes, only the primary writes (train() uses is_primary())
    trainlib.train(
        effect, epochs=1, n_data_points=32, batch_size=8, lr_max=2e-4,
        compute_dtype=jnp.float32, cp_every=1, plot_every=100, make_plots=False,
    )

    # 2) controlled numerics probe for the oracle comparison in the parent
    model = st_model(num_knobs=4, compute_dtype=jnp.float32)
    params0 = model.init(jax.random.PRNGKey(0))
    mesh = meshlib.make_mesh(n_model=1)  # 8x1 over the GLOBAL device set
    params = jax.device_put(params0, meshlib.param_shardings(mesh, params0))
    tx, _ = trainlib.make_optimizer(1e-4, 256, 2, 16)
    opt_state = tx.init(params)
    batch_fn = synth_data.make_synth_batch_fn(
        effect, model.spec.in_chunk_size, model.spec.out_chunk_size
    )
    step = trainlib.make_train_step(model, tx, batch_fn, 16, mesh=mesh)
    params, opt_state, loss = step(
        params, opt_state, jnp.asarray(0), jax.random.PRNGKey(1)
    )
    with open(f"probe_loss_p{pid}.txt", "w") as f:
        f.write(repr(float(loss)))
    print(f"child {pid} done, probe loss {float(loss):.9e}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
