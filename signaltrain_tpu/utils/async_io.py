"""Asynchronous observability I/O for the training loop.

The reference's eval_status_save (train.py:28-80) blocks the train loop on
every epoch's host work: checkpoint torch.save, 50-PNG matplotlib renders,
and the val-tensor fetch. On this harness those cost ~10x a small-geometry
epoch's device compute (docs/ROUND2_NOTES.md); on any machine they serialize
host work behind device work for no reason.

Two pieces:

* AsyncWriter — a single daemon worker thread draining a FIFO of closures.
  One thread (not a pool) so writes to the same files (logs, checkpoints,
  PNGs) keep their submission order. device_get inside a closure blocks the
  WORKER on the transfer while the main thread keeps dispatching train steps.

* snapshot() — device-side copy of a pytree. Checkpoint saves snapshot
  params/opt_state with an on-device copy (HBM->HBM, async, ~ms) before
  handing them to the worker: the originals are donated to the next train
  step (donate_argnums), so the worker must never read them directly.
"""

from __future__ import annotations

import queue
import threading
import traceback
from typing import Callable


_snap_jit = None


def snapshot(tree):
    """Device-side copy of every array leaf (async dispatch, returns
    immediately). Safe to fetch from another thread even after the original
    buffers are donated to a later jit call.

    The copy is ONE jitted call over the whole tree, not per-leaf eager
    jnp.copy: on a relay-backed device each eager dispatch costs tens of
    ms, and a 40-leaf eager snapshot measured ~6 s of host time
    (ST_TPU_TIMING, round 4) vs ~ms for the fused call. jit specializes
    per tree structure; non-array leaves pass through untouched."""
    import jax
    import jax.numpy as jnp

    global _snap_jit
    if _snap_jit is None:
        _snap_jit = jax.jit(
            lambda arrs: jax.tree.map(jnp.copy, arrs)
        )
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    is_arr = [hasattr(a, "devices") for a in leaves]
    arr_leaves = [a for a, f in zip(leaves, is_arr) if f]
    copied = iter(_snap_jit(arr_leaves) if arr_leaves else [])
    new_leaves = [next(copied) if f else a for a, f in zip(leaves, is_arr)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class AsyncWriter:
    """FIFO background executor for observability work (plots, checkpoints,
    log lines). A failing closure is printed immediately (mid-run the loop
    keeps training) and the FIRST failure is re-raised from close(), so a
    run whose checkpoint save failed cannot end looking successful."""

    def __init__(self, name: str = "st-obs-writer"):
        self._q: queue.Queue = queue.Queue()
        self._first_error: Exception | None = None
        self._thread = threading.Thread(target=self._work, name=name, daemon=True)
        self._thread.start()

    def submit(self, fn: Callable[[], None]) -> None:
        self._q.put(fn)

    def _work(self):
        while True:
            fn = self._q.get()
            if fn is None:
                return
            try:
                fn()
            except Exception as e:
                traceback.print_exc()
                if self._first_error is None:
                    self._first_error = e

    def pending(self) -> int:
        return self._q.qsize()

    def close(self, timeout: float | None = None) -> None:
        """Drain the queue and join the worker (call once, at train end).
        Raises the first closure failure, if any."""
        self._q.put(None)
        self._thread.join(timeout=timeout)
        if self._first_error is not None:
            raise RuntimeError(
                "async observability write failed during the run"
            ) from self._first_error
