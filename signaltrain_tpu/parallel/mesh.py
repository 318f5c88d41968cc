"""Device mesh and sharding policy.

The reference's only parallelism is 10 dataloader workers plus a hard-disabled
nn.DataParallel (train.py:260-263). Here parallel scaling is first-class:

* 'data' axis — batch-dim data parallelism over ICI. Gradients all-reduce
  implicitly through sharded autodiff (psum inserted by XLA's SPMD
  partitioner). On-device data synthesis partitions along with the batch, so
  each chip generates exactly its shard.
* 'model' axis — optional tensor parallelism for the four (ft, ft) front-end
  GEMMs (the 99.6% of parameters): weights sharded over rows/cols, XLA
  inserting the reduce-scatter/all-gather.

The default policy for one-host TPU (v5e-8 and friends) is a 1-D data mesh —
the model is 4.2M params, so DP is the bandwidth-optimal layout; the model
axis exists to exercise and validate TP plumbing for scaled geometries
(--scale grows chunk_size and frame counts).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for (B, ...) arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, state):
    """Sharding tree for optimizer state built by tx.init(params): array
    leaves inherit the params' mesh shardings through zeros_like, but scalar
    counters (optax's `count`) are created fresh and land UNCOMMITTED on the
    default device. Committing a restored state to those raw shardings pins
    count to one device while params live on the mesh, and the jitted step
    raises 'incompatible devices' (round-5 mesh-resume bug, caught by
    tests/test_mesh_elastic.py). Normalize: keep NamedShardings on this
    mesh, replicate everything else."""

    def fix(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return sh
        return NamedSharding(mesh, P())

    return jax.tree.map(fix, state)


def param_shardings(mesh: Mesh, params):
    """Sharding tree for the model params: front-end (ft, ft) matrices are
    sharded over the 'model' axis (output/channel rows); everything else
    (the ~8k-param autoencoders) is replicated."""

    def leaf_spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any(n in ("dft_analysis", "dft_synthesis") for n in names) and leaf.ndim == 2:
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_spec, params)
