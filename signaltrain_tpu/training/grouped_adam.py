"""Shape-grouped Adam: the same update math as optax.adam(lr, 0.9, 0.999,
1e-8) — equal to float ulp under XLA reassociation — with the parameter tree
packed into a few stacked groups, so one update
compiles to ~8 fused ops instead of ~64 tiny (<64 KB) multiply_add fusions
(docs/PERF_PROFILE.md "optimizer" bucket: ~0.93 ms/step of pure dispatch at
batch 800 on the flagship model's 40-leaf tree).

Packing rules — and why this is not the flat-vector dead end re-tried:

- Leaves with >= big_elems elements are stacked with identical-shape peers
  along a NEW LEADING axis (the flagship's four 1024x1024 front-end
  matrices become one (4, 1024, 1024)). TPU tiles the trailing two dims
  (8, 128); a leading-axis stack preserves that tiling, so pack/unpack is a
  plain HBM copy (~17 MB, ~tens of us) — NOT the 1-D <-> tiled-2-D
  bitcast_convert retile that cost the flat-vector experiment +1.2 ms/step
  (docs/PERF_PROFILE.md, "Flat-vector optimizer" row).
- Every smaller leaf ravels into ONE 1-D vector (~17.5k params on the
  flagship) — tiny enough that its relayout is noise.

The partition is recomputed from the tree structure at trace time inside
both init and update (pure Python; zero runtime cost), so the transformation
stays a stateless optax.GradientTransformation and its state pytree
serializes through the normal checkpoint leaf path
(training/checkpoint.py save/restore_optax_state).

Reference for the optimizer it replaces: torch.optim.Adam with
weight_decay=0 at /root/reference/signaltrain/train.py:228.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class GroupedAdamState(NamedTuple):
    count: jax.Array  # int32 step counter (shared by bias correction + lr)
    mu: tuple  # packed first moments, one array per group
    nu: tuple  # packed second moments, one array per group


def _partition(leaves, big_elems: int):
    """Deterministic grouping of leaf indices: identical-shape groups for
    big leaves (stack), one catch-all for the rest (ravel+concat)."""
    big: dict = {}
    small = []
    for i, leaf in enumerate(leaves):
        if leaf.size >= big_elems:
            big.setdefault((leaf.shape, leaf.dtype), []).append(i)
        else:
            small.append(i)
    groups = [idx for _, idx in sorted(big.items(), key=lambda kv: str(kv[0]))]
    return groups, small


def _pack(leaves, groups, small):
    packed = [jnp.stack([leaves[i] for i in idx]) for idx in groups]
    if small:
        packed.append(jnp.concatenate([jnp.ravel(leaves[i]) for i in small]))
    return tuple(packed)


def _unpack(packed, groups, small, leaves_template):
    out = [None] * len(leaves_template)
    for gi, idx in enumerate(groups):
        for j, i in enumerate(idx):
            out[i] = packed[gi][j]
    if small:
        flat = packed[len(groups)]
        off = 0
        for i in small:
            n = leaves_template[i].size
            out[i] = jnp.reshape(flat[off:off + n], leaves_template[i].shape)
            off += n
    return out


def _find_adam_inner(plain_state):
    """Locate the ScaleByAdamState inside an optax.adam chain state."""
    for s in plain_state:
        fields = getattr(s, "_fields", ())
        if "mu" in fields and "nu" in fields and "count" in fields:
            return s
    raise ValueError("no ScaleByAdamState in optimizer state chain")


def from_plain_state(params, plain_state, big_elems: int = 65536) -> GroupedAdamState:
    """Convert an optax.adam(...) state for `params` into the grouped form.
    Used when resuming a checkpoint saved in the canonical per-leaf wire
    format (training/checkpoint.py) under the grouped optimizer."""
    adam = _find_adam_inner(plain_state)
    leaves = jax.tree_util.tree_leaves(params)
    groups, small = _partition(leaves, big_elems)
    mu = _pack(jax.tree_util.tree_leaves(adam.mu), groups, small)
    nu = _pack(jax.tree_util.tree_leaves(adam.nu), groups, small)
    return GroupedAdamState(count=jnp.asarray(adam.count, jnp.int32), mu=mu, nu=nu)


def to_plain_state(params, state: GroupedAdamState, plain_template,
                   big_elems: int = 65536):
    """Convert a GroupedAdamState back into the optax.adam chain layout of
    `plain_template` — the canonical checkpoint wire format, so checkpoints
    stay interchangeable between the two optimizers (and with older files).
    optax's adam/schedule counts increment in lockstep, so both get
    state.count."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    groups, small = _partition(leaves, big_elems)
    unflatten = jax.tree_util.tree_unflatten
    mu_tree = unflatten(treedef, _unpack(state.mu, groups, small, leaves))
    nu_tree = unflatten(treedef, _unpack(state.nu, groups, small, leaves))
    adam_t = _find_adam_inner(plain_template)
    out = []
    for s in plain_template:
        if s is adam_t:
            out.append(s._replace(count=state.count, mu=mu_tree, nu=nu_tree))
        elif "count" in getattr(s, "_fields", ()):
            out.append(s._replace(count=state.count))
        else:
            out.append(s)
    return type(plain_template)(out)


def grouped_adam(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    big_elems: int = 65536,
) -> optax.GradientTransformation:
    """Drop-in for optax.adam(learning_rate, b1, b2, eps): same update values
    (verified elementwise-equal in tests/test_training.py), fewer dispatches."""

    def init(params):
        leaves = jax.tree_util.tree_leaves(params)
        groups, small = _partition(leaves, big_elems)
        zeros = [jnp.zeros_like(x) for x in leaves]
        # mu and nu must be DISTINCT buffers: the jitted train step donates
        # opt_state, and aliased leaves would be donated twice
        mu = _pack(zeros, groups, small)
        nu = _pack([jnp.zeros_like(x) for x in leaves], groups, small)
        return GroupedAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(grads, state, params=None):
        del params
        leaves, treedef = jax.tree_util.tree_flatten(grads)
        groups, small = _partition(leaves, big_elems)
        g = _pack(leaves, groups, small)
        # Math order matches optax.scale_by_adam + scale_by_learning_rate:
        # count increments first; bias correction and the schedule both see
        # the incremented count (optax evaluates the schedule at the
        # *pre-increment* inner count of scale_by_learning_rate, which equals
        # this count - 1; see the equality test for the pinned behavior).
        count = state.count + 1
        mu = tuple(b1 * m + (1.0 - b1) * gi for m, gi in zip(state.mu, g))
        nu = tuple(b2 * v + (1.0 - b2) * (gi * gi) for v, gi in zip(state.nu, g))
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate
        upd = tuple(
            (-lr) * ((m / c1) / (jnp.sqrt(v / c2) + eps))
            for m, v in zip(mu, nu)
        )
        updates = jax.tree_util.tree_unflatten(
            treedef, _unpack(upd, groups, small, leaves)
        )
        return updates, GroupedAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
