"""Sampled training with the FEATURE TABLE sharded across devices.

The reason multi-chip exists for GNN serving/training: the feature table is
the big array (ogbn-products at F=1024 f32 is ~10 GB — more than one chip's
comfortable share), while graph topology (int32) is comparatively small.
Here node features live interleaved across the mesh ``axis`` (owner of node
``i`` is ``i % P`` — interleaving spreads power-law hub nodes evenly, unlike
block ownership), each device samples its own seed shard with counter-based
keys, and the tree's feature fetch becomes a two-``all_to_all`` halo
exchange (the Ulysses-shaped pattern of SURVEY §2.5/§5): requests route to
owners, owners gather locally (small-shard gathers are ~5x faster per access
than big-table gathers, BASELINE.md), rows route back.

The reference has no distributed anything (SURVEY §2.5); this is the
TPU-native replacement for what a parameter-server/feature-store does in
CPU GNN stacks.

Static shapes: per-owner request capacity is ``capacity_factor *
ceil(L / P)``.  Ownership is interleaved so per-owner counts concentrate
tightly around L/P (multinomial; >100 sigma below a 1.3x capacity at
production sizes); overflowing requests yield zero rows and are counted in
the returned diagnostics.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sampling import rng
from ..sampling.neighbor import _sample_neighbors_impl
from .train import TrainState


def build_interleaved_features(x: np.ndarray, num_parts: int) -> np.ndarray:
    """Rearrange (N, F) so shard p (rows [p*Np, (p+1)*Np)) holds nodes
    p, p+P, p+2P, ... — shard with ``NamedSharding(mesh, P('data'))``."""
    n, f = x.shape
    npp = -(-n // num_parts)
    pad = npp * num_parts - n
    if pad:
        x = np.concatenate([x, np.zeros((pad, f), x.dtype)])
    return np.ascontiguousarray(
        x.reshape(npp, num_parts, f).transpose(1, 0, 2).reshape(-1, f))


def halo_gather(x_shard: jax.Array, ids: jax.Array, *, axis: str,
                num_parts: int, capacity: int, valid=None,
                num_rounds: int = 1):
    """Fetch rows of the interleaved-sharded table (INSIDE shard_map).

    x_shard: (Np, F) this device's shard; ids: (L,) global node ids;
    ``valid``: optional (L,) bool — invalid slots never consume per-owner
    request capacity (they get zero rows) and are excluded from the
    overflow count, so the diagnostic reports only REAL feature loss.
    ``num_rounds > 1`` retries requests whose per-owner rank overflowed
    ``capacity`` in further all_to_all rounds (round ``r`` carries ranks
    ``[r*capacity, (r+1)*capacity)``) so frontiers concentrated on few
    owners — power-law hubs — lose rows only past ``num_rounds*capacity``.
    Returns ((L, F) rows, overflow_count).
    """
    L = ids.shape[0]
    owner = (ids % num_parts).astype(jnp.int32)
    local = (ids // num_parts).astype(jnp.int32)
    if valid is None:
        valid = jnp.ones((L,), bool)
    return routed_row_fetch(x_shard, owner, local, valid, axis=axis,
                            num_parts=num_parts, capacity=capacity,
                            num_rounds=num_rounds)


def routed_row_fetch(table, owner, local, valid, *, axis: str,
                     num_parts: int, capacity: int, num_rounds: int = 1):
    """Owner-routed row fetch with explicit (owner, local) addressing
    (INSIDE shard_map): requests route to ``owner`` over ``axis``, owners
    gather ``table[local]`` from their own ``table``, rows route back.
    :func:`halo_gather` is the interleaved-ownership instantiation; the
    hierarchical trainer addresses a slice-gathered table instead
    (``dist_sampling._hier_feature_gather``).  Returns ((L, F) rows,
    overflow count of valid requests no round carried).
    """
    L = owner.shape[0]
    # invalid slots never consume capacity; routing plans (identity at
    # P=1 / counting-scan general) come from dist_sampling._route_to_owners
    from .dist_sampling import _route_to_owners
    router = _route_to_owners(owner, valid, num_parts, capacity)
    rounds = (num_rounds if router.max_rounds is None
              else min(num_rounds, router.max_rounds))
    out = jnp.zeros((L, table.shape[-1]), table.dtype)
    got = jnp.zeros((L,), bool)
    for rnd in range(rounds):
        in_round = router.in_round(rnd)
        req = router.scatter(local, rnd)
        # route requests to owners; owners gather locally; rows route back
        with jax.named_scope("halo.route_requests"):
            peer_req = jax.lax.all_to_all(req, axis, 0, 0)  # (P, C) of me
        with jax.named_scope("halo.owner_gather"):
            rows = table[jnp.clip(peer_req, 0, table.shape[0] - 1)]
        with jax.named_scope("halo.route_rows"):
            back = jax.lax.all_to_all(rows, axis, 0, 0)     # (P, C, F) mine
        mine = router.pickup(back, rnd)
        # single mask per round: rows outside the round stay at their prior
        # value (zeros in round 0) — the old trailing where(got) re-stream
        # of the (L, F) buffer was redundant with this mask
        out = jnp.where(in_round[:, None], mine, out)
        got = jnp.logical_or(got, in_round)
    return out, (~got & valid).sum()


def make_sharded_feature_trainer(
    model,
    fanouts: Sequence[int],
    mesh: Mesh,
    *,
    axis: str = "data",
    learning_rate: float = 1e-2,
    with_replacement: bool = False,
    window: int = 256,
    capacity_factor: float = 1.3,
    num_rounds: int | None = None,
):
    """Sampled-training closures where ``x`` is interleave-sharded over
    ``mesh[axis]`` and seed/label batches are sharded over the same axis.

    Returns (init_fn, train_step, eval_step):
      init_fn(key, graph, x_sharded, seeds) -> TrainState (replicated)
      train_step(state, key, graph, x_sharded, seeds, labels)
        -> (state, loss, acc, halo_overflow)
    Gradients all-reduce over ``axis`` (XLA psum); sampling keys fold the
    device index so draws are device-distinct yet reproducible.
    """
    tree_forward = type(model).tree_forward
    fanouts = tuple(int(k) for k in fanouts)
    tx = optax.adam(learning_rate)
    num_parts = int(mesh.shape[axis])
    from .dist_sampling import resolve_num_rounds
    num_rounds = resolve_num_rounds(num_rounds, num_parts)

    def _sample_and_gather(key, graph, x_shard, seeds_local):
        zeros = jnp.zeros((seeds_local.shape[0],), jnp.int32)
        with jax.named_scope("sample"):
            sample = _sample_neighbors_impl(
                key, graph, seeds_local.astype(jnp.int32), zeros, None, None,
                fanouts, with_replacement, None, window)
        n_rows = x_shard.shape[0] * num_parts
        ids = jnp.clip(sample.nodes, 0, n_rows - 1)
        capacity = int(np.ceil(capacity_factor * ids.shape[0] / num_parts))
        capacity = min(capacity, ids.shape[0])
        # invalid padding slots don't consume request capacity and get zero
        # rows (never read through a valid tree path)
        x, overflow = halo_gather(x_shard, ids, axis=axis,
                                  num_parts=num_parts, capacity=capacity,
                                  valid=sample.node_valid,
                                  num_rounds=num_rounds)
        return sample, x, overflow

    def _loss(params, key, graph, x_shard, seeds_local, labels_local,
              deterministic):
        sample, x, overflow = _sample_and_gather(key, graph, x_shard,
                                                 seeds_local)
        logits = model.apply(params, sample, x, deterministic=deterministic,
                             rngs={"dropout": rng.fold(key,
                                                       rng.DROPOUT_STREAM)},
                             method=tree_forward)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels_local).mean()
        return loss, (logits, overflow)

    repl, shard = P(), P(axis)

    def init_fn(key, graph, x_sharded, seeds):
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(repl, repl, shard, shard),
                           out_specs=repl)
        def _init(key, graph, x_shard, seeds_local):
            sample, x, _ = _sample_and_gather(key, graph, x_shard,
                                              seeds_local)
            params = model.init(key, sample, x, method=tree_forward)
            # params are computed from device-0-identical math but typed as
            # device-varying by the halo all_to_all; make replication explicit
            return jax.lax.pmean(params, axis)

        params = _init(key, graph, x_sharded, seeds)
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state: TrainState, key, graph, x_sharded, seeds, labels):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(repl, repl, repl, repl, repl, shard, shard, shard),
            out_specs=(repl, repl, repl, repl, repl))
        def _step(params, opt_state, step, key, graph, x_shard, seeds_local,
                  labels_local):
            dev = jax.lax.axis_index(axis)
            k = rng.fold(key, step, dev)
            (loss, (logits, overflow)), grads = jax.value_and_grad(
                _loss, has_aux=True)(params, k, graph, x_shard, seeds_local,
                                     labels_local, False)
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            acc = jax.lax.pmean(
                (logits.argmax(-1) == labels_local).mean(), axis)
            overflow = jax.lax.psum(overflow, axis)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, loss, acc, overflow

        params, opt_state, loss, acc, overflow = _step(
            state.params, state.opt_state, state.step, key, graph, x_sharded,
            seeds, labels)
        return (TrainState(params, opt_state, state.step + 1),
                loss, acc, overflow)

    @jax.jit
    def eval_step(state: TrainState, key, graph, x_sharded, seeds, labels):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(repl, repl, repl, shard, shard, shard),
            out_specs=(repl, repl))
        def _eval(params, key, graph, x_shard, seeds_local, labels_local):
            dev = jax.lax.axis_index(axis)
            k = rng.fold(key, jnp.asarray(1 << 20, jnp.uint32), dev)
            loss, (logits, _) = _loss(params, k, graph, x_shard, seeds_local,
                                      labels_local, True)
            acc = (logits.argmax(-1) == labels_local).mean()
            return jax.lax.pmean(loss, axis), jax.lax.pmean(acc, axis)

        return _eval(state.params, key, graph, x_sharded, seeds, labels)

    return init_fn, train_step, eval_step
