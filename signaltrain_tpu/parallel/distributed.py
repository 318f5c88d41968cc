"""Multi-host (pod) initialization.

Single-host meshes need nothing; on a multi-host TPU pod, call initialize()
once per process before touching devices and every parallel/mesh.py helper
then operates on the global device set (jax.devices() spans hosts; data
parallelism rides ICI within a slice and DCN across, with XLA choosing the
collectives). The reference had no distributed backend at all
(SURVEY.md §5: DataParallel hard-disabled)."""

from __future__ import annotations


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               **kwargs):
    """jax.distributed.initialize, with TPU auto-detection when args are
    omitted (GCE metadata supplies coordinator/process info on Cloud TPU)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    print(
        f"jax.distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints/plots."""
    import jax

    return jax.process_index() == 0
