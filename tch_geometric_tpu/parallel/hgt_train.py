"""End-to-end heterogeneous training: HGT sampling -> relation-typed
attention, one jitted step (BASELINE config 4: fakehetero/ogbn-mag-style).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.hgt import HGT
from ..sampling import rng
from ..sampling.hgt import _hgt_sampling_impl
from ..utils.types import rel_key


class HGTTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_hgt_trainer(
    model: HGT,
    graphs: Dict[str, Any],
    edge_types: Sequence[Tuple[str, str, str]],
    num_samples: Dict[str, Sequence[int]],
    num_hops: int,
    node_counts: Dict[str, int],
    x_tables: Dict[str, jax.Array],
    *,
    seed_type: str,
    learning_rate: float = 1e-3,
    edge_timestamps=None,
    timerange=None,
):
    """(init_fn, train_step): HGT budget sampling inside the jitted step.

    Seeds are nodes of ``seed_type``; the loss is cross-entropy on the seed
    slots of the model's ``out_type`` output.
    """
    tx = optax.adam(learning_rate)
    node_types = tuple(sorted(node_counts))
    rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in edge_types))
    meta = (
        node_types,
        rel_specs,
        tuple((t, tuple(int(x) for x in num_samples[t])) for t in node_types),
        int(num_hops),
        None if timerange is None else (int(timerange[0]), int(timerange[1])),
        tuple((t, int(node_counts[t])) for t in node_types),
    )

    # graphs / x_tables / edge_timestamps enter the jitted step as PYTREE
    # ARGUMENTS, never as closed-over constants: closing over them embeds
    # the whole graph + feature table in the HLO, and the remote compile
    # service rejects production-scale programs with HTTP 413 (the same
    # lesson BASELINE.md records for the SAGE trainer; hit again at the
    # 3x200k-node hetero-skew bench scale, round 4)
    def sample_and_gather(key, seeds, graphs_, x_tables_, ts_):
        sample = _hgt_sampling_impl(
            key, graphs_, ts_, {seed_type: seeds}, None, meta)
        feats = {}
        for t in node_types:
            nodes = jnp.clip(sample.nodes[t], 0, node_counts[t] - 1)
            xt = x_tables_[t][nodes]
            feats[t] = jnp.where(sample.node_valid[t][:, None], xt, 0.0)
        edges = {r: (sample.rows[r], sample.cols[r], sample.edge_valid[r])
                 for r in sample.rows}
        return sample, feats, edges

    def loss_fn(params, key, seeds, labels, graphs_, x_tables_, ts_):
        sample, feats, edges = sample_and_gather(key, seeds, graphs_,
                                                 x_tables_, ts_)
        logits = model.apply(params, feats, edges)
        n = seeds.shape[0]
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits[:n], labels).mean()
        return loss, logits[:n]

    def init_fn(key, seeds):
        _s, feats, edges = sample_and_gather(key, seeds, graphs, x_tables,
                                             edge_timestamps)
        params = model.init(key, feats, edges)
        return HGTTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def _train_step_impl(state: HGTTrainState, key, seeds, labels, graphs_,
                         x_tables_, ts_):
        step_key = rng.fold(key, state.step)
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, step_key, seeds, labels, graphs_, x_tables_, ts_)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = (logits.argmax(-1) == labels).mean()
        return HGTTrainState(params, opt_state, state.step + 1), loss, acc

    def train_step(state: HGTTrainState, key, seeds, labels):
        return _train_step_impl(state, key, seeds, labels, graphs, x_tables,
                                edge_timestamps)

    return init_fn, train_step


def make_partitioned_hgt_trainer(
    model: HGT,
    edge_types: Sequence[Tuple[str, str, str]],
    num_samples: Dict[str, Sequence[int]],
    num_hops: int,
    node_counts: Dict[str, int],
    mesh,
    *,
    seed_type: str,
    axis: str = "data",
    learning_rate: float = 1e-3,
    timerange=None,
    capacity_factor: float = 2.0,
    num_rounds: Optional[int] = None,
    fused: bool = True,
):
    """Typed training with NOTHING graph-sized replicated (VERDICT r3 #3).

    Composes the distributed HGT sampler (``dist_hgt.dist_hgt_sample``'s
    per-device engine — sharded fixed-point score budgets, owner-routed
    budget updates, distributed score^2 top-k) with per-type
    interleave-sharded feature tables (``sharded_features.
    build_interleaved_features`` per type) and the relation-typed HGT
    model, all inside ONE jitted shard_map step.  The typed analogue of
    ``dist_sampling.make_partitioned_trainer``; matches the training
    surface the reference's HGT sampler exists to feed
    (/root/reference/src/algo/hgt_sampling.rs:138-278,
    /root/reference/examples/hgt_sampling.py:23-30).

    Data layout per step: the sampler's per-type node lists come out
    replicated (identical on every device); the induced per-rel COO is
    device-sliced by dst slot, so each device computes messages for its
    edge block only and the model's per-layer ``psum`` (``HGT.psum_axis``)
    reassembles replicated hidden states — per-dst attention softmax needs
    no communication because a dst slot's in-edges live on one device.
    Draws are uid-keyed, so sampled subgraphs (and loss trajectories, to
    psum rounding) are device-count invariant (tests/test_dist_hgt.py).

    Returns ``(init_fn, train_step, eval_step)``:
      ``init_fn(key, rels, x_tables, seeds)``;
      ``train_step(state, key, rels, x_tables, seeds, labels,
      seed_ts=None) -> (state, loss, acc, overflow)``.
    ``rels`` from ``dist_hgt.build_partitioned_hetero``; ``x_tables`` a
    dict type -> interleave-sharded feature table (sharded over ``axis``);
    ``seeds (B,)`` global ids of ``seed_type`` (B divisible by mesh size),
    replicated; ``labels (B,)`` replicated.

    When ``rels`` is a :class:`~.dist_hgt.StackedRels`, ``fused`` selects
    the sampler engine: True (default) batches every relation's requests
    into one exchange per phase (op count ~constant in R, R-times larger
    collectives); False scans one relation per step (A/B baseline).
    """
    import functools

    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..utils.types import NAN_TIMESTAMP, rel_key
    from .dist_hgt import _dist_hgt_device
    from .sharded_features import halo_gather

    tx = optax.adam(learning_rate)
    Pn = int(mesh.shape[axis])
    from .dist_sampling import resolve_num_rounds
    num_rounds = resolve_num_rounds(num_rounds, Pn)
    node_types = tuple(sorted(node_counts))
    rel_specs = tuple(sorted((rel_key(tuple(e)), e[0], e[2])
                             for e in edge_types))
    ns = {t: tuple(-(-int(x) // Pn) * Pn for x in num_samples[t])
          for t in node_types}
    dist_model = model.clone(psum_axis=axis)

    def _meta(n_seeds: int):
        assert n_seeds % Pn == 0, (n_seeds, Pn)
        seed_caps = tuple(sorted(
            {t: (n_seeds if t == seed_type else 0)
             for t in node_types}.items()))
        return (node_types, rel_specs,
                tuple((t, ns[t]) for t in node_types), int(num_hops),
                None if timerange is None else (int(timerange[0]),
                                                int(timerange[1])),
                tuple((t, int(node_counts[t])) for t in node_types),
                seed_caps, float(capacity_factor), int(num_rounds), Pn)

    def _sample_gather(key, rels, x_shards, seeds, seed_ts, dev):
        meta = _meta(seeds.shape[0])
        seeds_d = {t: (seeds.astype(jnp.int32) if t == seed_type
                       else jnp.zeros((0,), jnp.int32))
                   for t in node_types}
        ts_d = {t: (seed_ts.astype(jnp.int32) if t == seed_type
                    else jnp.zeros((0,), jnp.int32))
                for t in node_types}
        (nodes, _nts, node_valid, rows, cols, _eptr, ev,
         ovf) = _dist_hgt_device(key, rels, seeds_d, ts_d, dev=dev,
                                 meta=meta, axis=axis, fused=fused)
        feats = {}
        for t in node_types:
            n_rows = x_shards[t].shape[0] * Pn
            ids = jnp.clip(nodes[t], 0, n_rows - 1)
            cap = max(1, min(int(np.ceil(capacity_factor * ids.shape[0]
                                         / Pn)), ids.shape[0]))
            x, o = halo_gather(x_shards[t], ids, axis=axis, num_parts=Pn,
                               capacity=cap, valid=node_valid[t],
                               num_rounds=num_rounds)
            feats[t] = jnp.where(node_valid[t][:, None], x, 0.0)
            ovf = ovf + o
        edges = {r: (rows[r], cols[r], ev[r]) for r in rows}
        return feats, edges, node_valid, ovf

    def _loss(params, key, rels, x_shards, seeds, seed_ts, labels, dev):
        feats, edges, node_valid, ovf = _sample_gather(
            key, rels, x_shards, seeds, seed_ts, dev)
        logits = dist_model.apply(params, feats, edges)
        n = seeds.shape[0]
        ok = node_valid[seed_type][:n]
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits[:n], labels)
        loss = (ce * ok).sum() / jnp.maximum(ok.sum(), 1)
        return loss, (logits[:n], ok, ovf)

    repl, shard = P(), P(axis)

    def _ts_or_nan(seed_ts, seeds):
        if seed_ts is None:
            return jnp.full(jnp.shape(seeds), NAN_TIMESTAMP, jnp.int32)
        return jnp.asarray(seed_ts, jnp.int32)

    def init_fn(key, rels, x_tables, seeds, seed_ts=None):
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(repl, shard, shard, repl, repl),
                           out_specs=repl)
        def _init(key, rels_s, x_shards, seeds_r, ts_r):
            dev = jax.lax.axis_index(axis)
            feats, edges, _nv, _ovf = _sample_gather(
                key, rels_s, x_shards, seeds_r, ts_r, dev)
            params = dist_model.init(key, feats, edges)
            return jax.lax.pmean(params, axis)

        params = _init(key, rels, x_tables, jnp.asarray(seeds, jnp.int32),
                       _ts_or_nan(seed_ts, seeds))
        return HGTTrainState(params, tx.init(params),
                             jnp.zeros((), jnp.int32))

    @jax.jit
    def _train_impl(state, key, rels, x_tables, seeds, labels, seed_ts):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(repl, repl, repl, repl, shard, shard, repl, repl,
                      repl),
            out_specs=(repl, repl, repl, repl, repl))
        def _step(params, opt_state, step, key, rels_s, x_shards, seeds_r,
                  labels_r, ts_r):
            dev = jax.lax.axis_index(axis)
            k = rng.fold(key, step)
            (loss, (logits, ok, ovf)), grads = jax.value_and_grad(
                _loss, has_aux=True)(params, k, rels_s, x_shards, seeds_r,
                                     ts_r, labels_r, dev)
            grads = jax.lax.pmean(grads, axis)
            acc = ((logits.argmax(-1) == labels_r) * ok).sum() \
                / jnp.maximum(ok.sum(), 1)
            # loss/acc are already replicated (they flow through the model's
            # psum), but the VMA checker can't see that — pmean makes it
            # statically inferable at zero numerical cost
            loss = jax.lax.pmean(loss, axis)
            acc = jax.lax.pmean(acc, axis)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, loss, acc, jax.lax.psum(ovf, axis)

        params, opt_state, loss, acc, overflow = _step(
            state.params, state.opt_state, state.step, key, rels, x_tables,
            seeds, labels, seed_ts)
        return (HGTTrainState(params, opt_state, state.step + 1), loss, acc,
                overflow)

    def train_step(state, key, rels, x_tables, seeds, labels, seed_ts=None):
        return _train_impl(state, key, rels, x_tables,
                           jnp.asarray(seeds, jnp.int32),
                           jnp.asarray(labels),
                           _ts_or_nan(seed_ts, seeds))

    @jax.jit
    def _eval_impl(state, key, rels, x_tables, seeds, labels, seed_ts):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(repl, repl, shard, shard, repl, repl, repl),
            out_specs=(repl, repl))
        def _eval(params, key, rels_s, x_shards, seeds_r, labels_r, ts_r):
            dev = jax.lax.axis_index(axis)
            k = rng.fold(key, jnp.asarray(1 << 20, jnp.uint32))
            loss, (logits, ok, _ovf) = _loss(params, k, rels_s, x_shards,
                                             seeds_r, ts_r, labels_r, dev)
            acc = ((logits.argmax(-1) == labels_r) * ok).sum() \
                / jnp.maximum(ok.sum(), 1)
            return jax.lax.pmean(loss, axis), jax.lax.pmean(acc, axis)

        return _eval(state.params, key, rels, x_tables, seeds, labels,
                     seed_ts)

    def eval_step(state, key, rels, x_tables, seeds, labels, seed_ts=None):
        return _eval_impl(state, key, rels, x_tables,
                          jnp.asarray(seeds, jnp.int32),
                          jnp.asarray(labels),
                          _ts_or_nan(seed_ts, seeds))

    return init_fn, train_step, eval_step
