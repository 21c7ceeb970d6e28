"""End-to-end link-prediction training with on-device negative sampling.

The reference's negative sampler exists to build link-prediction batches
for downstream PyG models (/root/reference/examples/negative_sampling.py,
/root/reference/src/algo/negative_sampling.rs) — the model itself is
delegated.  Here the WHOLE pipeline is one jitted step:

  sample trees for the batch edges' endpoints -> GNN-encode (any
  ``tree_forward`` model) -> score positives <h_u, h_v> -> draw uniform
  corrupt destinations, reject true edges with the same batched
  binary-search probe the negative sampler uses (rs:31-45 semantics) ->
  BCE on positive + accepted-negative scores.

Orientation contract: the sampler (`_sample_neighbors_impl`) requires the
**CSC** orientation (rows = in-neighbors), so the corrupted-edge probe
``src -> cand`` must read *cand's* CSC row — ``has_edge(cand, src)`` —
not src's (which would test the reverse edge ``cand -> src``).  Both
trainers reject a candidate that is a true edge OR equals either endpoint
(``cand != src`` and ``cand != dst``) so the single-chip and partitioned
losses are the same function of the same data; the reference's own law
rejects only self (rs:33).

Negatives are encoded through the same sampled trees as the batch
endpoints (they join the seed list), so one sampler invocation serves
encoder AND decoder — no second pipeline, no host round-trip.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..sampling import rng
from ..sampling.neighbor import _sample_neighbors_impl
from .train import TrainState


def make_link_trainer(model, fanouts: Sequence[int], *,
                      num_neg: int = 1, try_count: int = 8,
                      learning_rate: float = 1e-3, window: int = 256):
    """Trainer factory for link prediction with any ``tree_forward`` model.

    The step takes ``(state, key, graph, x_table, src, dst)`` where
    ``src/dst (B,)`` are the batch's positive edges.  Per positive edge,
    ``num_neg`` corrupt destinations are drawn uniformly (first of
    ``try_count`` candidates that is a non-edge and not the true dst —
    the reference's rejection law); rejected slots are masked out of the
    loss.  Returns ``(init_fn, train_step, eval_step)``; eval returns
    (loss, auc-style pairwise ranking accuracy).
    """
    tree_forward = type(model).tree_forward
    fanouts = tuple(int(k) for k in fanouts)
    tx = optax.adam(learning_rate)

    def encode_and_score(params, key, graph, x_table, src, dst,
                         deterministic=True):
        B = src.shape[0]
        # corrupt destinations, keyed per (edge, neg) slot
        nkey = rng.fold(key, 7)
        cand = jax.random.randint(nkey, (B, num_neg, try_count), 0,
                                  graph.num_dst, dtype=jnp.int32)
        # graph is a CSC (rows = in-neighbors): probing src -> cand means
        # searching cand's row for src.
        exists = graph.has_edge(
            cand, jnp.broadcast_to(src[:, None, None], cand.shape))
        ok = (~exists) & (cand != dst[:, None, None]) \
            & (cand != src[:, None, None])
        first = jnp.argmax(ok, axis=-1)
        neg_ok = jnp.any(ok, axis=-1)                      # (B, num_neg)
        neg = jnp.take_along_axis(cand, first[..., None], axis=-1)[..., 0]

        # ONE sampler invocation encodes src + dst + negatives together
        seeds = jnp.concatenate(
            [src.astype(jnp.int32), dst.astype(jnp.int32),
             neg.reshape(-1)])
        zeros = jnp.zeros((seeds.shape[0],), jnp.int32)
        with jax.named_scope("sample"):
            sample = _sample_neighbors_impl(
                rng.fold(key, 11), graph, seeds, zeros, None, None,
                fanouts, False, None, window)
        with jax.named_scope("gather"):
            x = x_table[jnp.clip(sample.nodes, 0, x_table.shape[0] - 1)]
        with jax.named_scope("encode"):
            h = model.apply(params, sample, x, deterministic=deterministic,
                            rngs={"dropout": rng.fold(key,
                                                      rng.DROPOUT_STREAM)},
                            method=tree_forward)
        h_src, h_dst = h[:B], h[B: 2 * B]
        h_neg = h[2 * B:].reshape(B, num_neg, -1)
        pos = (h_src * h_dst).sum(-1)                      # (B,)
        negs = (h_src[:, None, :] * h_neg).sum(-1)         # (B, num_neg)
        return pos, negs, neg_ok

    def loss_fn(params, key, graph, x_table, src, dst, deterministic=True):
        pos, negs, neg_ok = encode_and_score(params, key, graph, x_table,
                                             src, dst, deterministic)
        pos_loss = optax.sigmoid_binary_cross_entropy(
            pos, jnp.ones_like(pos)).mean()
        neg_bce = optax.sigmoid_binary_cross_entropy(
            negs, jnp.zeros_like(negs))
        neg_loss = ((neg_bce * neg_ok).sum()
                    / jnp.maximum(neg_ok.sum(), 1))
        # pairwise ranking accuracy (AUC estimate on accepted negatives)
        rank_ok = ((pos[:, None] > negs) * neg_ok).sum() \
            / jnp.maximum(neg_ok.sum(), 1)
        return pos_loss + neg_loss, rank_ok

    def init_fn(key, graph, x_table, src, dst):
        B = src.shape[0]
        seeds = jnp.concatenate([src, dst, src[:1].repeat(B * num_neg)]
                                ).astype(jnp.int32)
        zeros = jnp.zeros((seeds.shape[0],), jnp.int32)
        sample = _sample_neighbors_impl(key, graph, seeds, zeros, None,
                                        None, fanouts, False, None, window)
        x = x_table[jnp.clip(sample.nodes, 0, x_table.shape[0] - 1)]
        params = model.init(key, sample, x, method=tree_forward)
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state: TrainState, key, graph, x_table, src, dst):
        step_key = rng.fold(key, state.step)
        (loss, auc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, step_key, graph, x_table, src, dst, False)
        with jax.named_scope("update"):
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss, auc

    @jax.jit
    def eval_step(state: TrainState, key, graph, x_table, src, dst):
        return loss_fn(state.params, key, graph, x_table, src, dst)

    return init_fn, train_step, eval_step


def make_partitioned_link_trainer(model, fanouts: Sequence[int], mesh, *,
                                  axis: str = "data", num_neg: int = 1,
                                  try_count: int = 8,
                                  learning_rate: float = 1e-3,
                                  weighted: bool = False,
                                  filter: Optional[tuple] = None,
                                  window: int = 256,
                                  capacity_factor: float = 1.3,
                                  num_rounds: Optional[int] = None):
    """Link-prediction training over a PARTITIONED graph: adjacency AND
    features sharded, negatives drawn/probed through the owner-routed
    exchange, trees sampled distributed, gradients pmean'd.

    ``graph`` must be a :class:`~.dist_sampling.PartitionedGraph` built
    from the **CSR** orientation (rows = out-neighbors, the probe
    direction); features interleave-shard
    (``sharded_features.build_interleaved_features``).  src/dst/feature
    tensors shard over ``axis``.  Every draw (trees AND negatives) is
    keyed by global uids, so the sampled trees and negatives are
    bit-identical for any device count and loss trajectories agree to
    float precision (cross-device psum reduction order contributes ~1e-7;
    pinned in tests/test_dist_negative.py).

    Each of the three seed segments (src, dst, negatives) samples its
    trees in its own distributed invocation — segment-local uids keep the
    P-invariance that a concatenated per-device seed list would break
    (the concat's global slot order depends on P).

    ``weighted=True`` samples encoder trees proportional to edge weights
    (graph built with ``edge_weights``); ``filter=((lo, hi), forward,
    mode)`` applies the 3-mode temporal filter during tree expansion
    (graph built with ``edge_timestamps``).  With a filter, the positive
    edge's timestamp can be passed as an optional trailing ``edge_ts``
    argument to ``train_step``/``eval_step`` — it seeds the root state of
    all three segments (src, dst, and each of src's negatives), CTDNE-style
    temporal link prediction.
    """
    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P  # noqa: F401
    from .dist_negative import _dist_negative_device
    from .dist_sampling import _dist_sample_device
    from .sharded_features import halo_gather

    tree_forward = type(model).tree_forward
    fanouts = tuple(int(k) for k in fanouts)
    tx = optax.adam(learning_rate)
    num_parts = int(mesh.shape[axis])
    from .dist_sampling import resolve_num_rounds
    num_rounds = resolve_num_rounds(num_rounds, num_parts)
    filter_static = None
    if filter is not None:
        filter_static = (tuple(int(v) for v in filter[0]), bool(filter[1]),
                         int(filter[2]))

    def _encode_segment(params, key, gshard, x_shard, seeds_local, dev,
                        deterministic, seed_state=None):
        total = seeds_local.shape[0] * num_parts
        sample, s_ovf = _dist_sample_device(
            key, gshard, seeds_local, dev=dev, fanouts=fanouts, axis=axis,
            num_parts=num_parts, total_seeds=total,
            capacity_factor=capacity_factor, with_replacement=False,
            weighted=weighted, filter_static=filter_static,
            seed_state=seed_state, window=window, num_rounds=num_rounds)
        n_rows = x_shard.shape[0] * num_parts
        ids = jnp.clip(sample.nodes, 0, n_rows - 1)
        cap = min(int(np.ceil(capacity_factor * ids.shape[0] / num_parts)),
                  ids.shape[0])
        x, f_ovf = halo_gather(x_shard, ids, axis=axis,
                               num_parts=num_parts, capacity=cap,
                               valid=sample.node_valid,
                               num_rounds=num_rounds)
        h = model.apply(params, sample, x, deterministic=deterministic,
                        rngs={"dropout": rng.fold(key, rng.DROPOUT_STREAM)},
                        method=tree_forward)
        return h, s_ovf + f_ovf

    def _loss(params, key, gshard, x_shard, src_local, dst_local, ts_local,
              dev, deterministic):
        L = src_local.shape[0]
        # owner-probed negatives (uid-keyed: P-invariant); reject both
        # endpoints so this is the same predicate as make_link_trainer
        neg, neg_ok, n_ovf = _dist_negative_device(
            rng.fold(key, 3), gshard, src_local, dev=dev, num_neg=num_neg,
            try_count=try_count, inbound=False, axis=axis,
            num_parts=num_parts, capacity_factor=capacity_factor,
            num_rounds=num_rounds, exclude=dst_local)
        h_src, o1 = _encode_segment(params, rng.fold(key, 4), gshard,
                                    x_shard, src_local.astype(jnp.int32),
                                    dev, deterministic, seed_state=ts_local)
        h_dst, o2 = _encode_segment(params, rng.fold(key, 5), gshard,
                                    x_shard, dst_local.astype(jnp.int32),
                                    dev, deterministic, seed_state=ts_local)
        neg_ts = jnp.broadcast_to(ts_local[:, None],
                                  (L, num_neg)).reshape(-1)
        h_neg, o3 = _encode_segment(params, rng.fold(key, 6), gshard,
                                    x_shard, neg.reshape(-1), dev,
                                    deterministic, seed_state=neg_ts)
        h_neg = h_neg.reshape(L, num_neg, -1)
        pos = (h_src * h_dst).sum(-1)
        negs = (h_src[:, None, :] * h_neg).sum(-1)
        pos_loss = optax.sigmoid_binary_cross_entropy(
            pos, jnp.ones_like(pos)).mean()
        neg_bce = optax.sigmoid_binary_cross_entropy(
            negs, jnp.zeros_like(negs))
        # global masked mean: psum numerator/denominator so the loss (and
        # therefore the gradients) match the single-device computation
        num = jax.lax.psum((neg_bce * neg_ok).sum(), axis)
        den = jax.lax.psum(neg_ok.sum(), axis)
        neg_loss = num / jnp.maximum(den, 1)
        rank = jax.lax.psum(((pos[:, None] > negs) * neg_ok).sum(), axis) \
            / jnp.maximum(den, 1)
        return jax.lax.pmean(pos_loss, axis) + neg_loss, \
            (rank, n_ovf + o1 + o2 + o3)

    repl, shard = P(), P(axis)

    def _ts_or_zeros(edge_ts, src):
        if edge_ts is None:
            return jnp.zeros(jnp.shape(src), jnp.int32)
        return jnp.asarray(edge_ts, jnp.int32)

    def init_fn(key, graph, x_sharded, src, dst, edge_ts=None):
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(repl, shard, shard, shard, shard),
                           out_specs=repl)
        def _init(key, gshard, x_shard, src_local, ts_local):
            dev = jax.lax.axis_index(axis)
            # init params from one segment's sample shapes
            total = src_local.shape[0] * num_parts
            sample, _ = _dist_sample_device(
                key, gshard, src_local.astype(jnp.int32), dev=dev,
                fanouts=fanouts, axis=axis, num_parts=num_parts,
                total_seeds=total, capacity_factor=capacity_factor,
                with_replacement=False, weighted=weighted,
                filter_static=filter_static, seed_state=ts_local,
                window=window, num_rounds=num_rounds)
            n_rows = x_shard.shape[0] * num_parts
            ids = jnp.clip(sample.nodes, 0, n_rows - 1)
            cap = min(int(np.ceil(capacity_factor * ids.shape[0]
                                  / num_parts)), ids.shape[0])
            x, _ = halo_gather(x_shard, ids, axis=axis,
                               num_parts=num_parts, capacity=cap,
                               valid=sample.node_valid,
                               num_rounds=num_rounds)
            params = model.init(key, sample, x, method=tree_forward)
            return jax.lax.pmean(params, axis)

        params = _init(key, graph, x_sharded, src, _ts_or_zeros(edge_ts,
                                                                src))
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    @jax.jit
    def _train_step_impl(state, key, graph, x_sharded, src, dst, edge_ts):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(repl, repl, repl, repl, shard, shard, shard, shard,
                      shard),
            out_specs=(repl, repl, repl, repl))
        def _step(params, opt_state, step, key, gshard, x_shard, src_local,
                  dst_local, ts_local):
            dev = jax.lax.axis_index(axis)
            k = rng.fold(key, step)
            (loss, (rank, ovf)), grads = jax.value_and_grad(
                _loss, has_aux=True)(params, k, gshard, x_shard, src_local,
                                     dst_local, ts_local, dev, False)
            grads = jax.lax.pmean(grads, axis)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, loss, jax.lax.psum(ovf, axis)

        params, opt_state, loss, overflow = _step(
            state.params, state.opt_state, state.step, key, graph,
            x_sharded, src, dst, edge_ts)
        return (TrainState(params, opt_state, state.step + 1), loss,
                overflow)

    def train_step(state: TrainState, key, graph, x_sharded, src, dst,
                   edge_ts=None):
        return _train_step_impl(state, key, graph, x_sharded, src, dst,
                                _ts_or_zeros(edge_ts, src))

    @jax.jit
    def _eval_step_impl(state, key, graph, x_sharded, src, dst, edge_ts):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(repl, repl, shard, shard, shard, shard, shard),
            out_specs=(repl, repl))
        def _eval(params, key, gshard, x_shard, src_local, dst_local,
                  ts_local):
            dev = jax.lax.axis_index(axis)
            k = rng.fold(key, jnp.asarray(1 << 20, jnp.uint32))
            loss, (rank, _) = _loss(params, k, gshard, x_shard, src_local,
                                    dst_local, ts_local, dev, True)
            return loss, rank

        return _eval(state.params, key, graph, x_sharded, src, dst, edge_ts)

    def eval_step(state: TrainState, key, graph, x_sharded, src, dst,
                  edge_ts=None):
        return _eval_step_impl(state, key, graph, x_sharded, src, dst,
                               _ts_or_zeros(edge_ts, src))

    return init_fn, train_step, eval_step
