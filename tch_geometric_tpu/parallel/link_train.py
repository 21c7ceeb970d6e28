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

Negatives are encoded through the same sampled trees as the batch
endpoints (they join the seed list), so one sampler invocation serves
encoder AND decoder — no second pipeline, no host round-trip.
"""
from __future__ import annotations

import functools
from typing import Sequence

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
        exists = graph.has_edge(
            jnp.broadcast_to(src[:, None, None], cand.shape), cand)
        ok = jnp.logical_and(~exists, cand != dst[:, None, None])
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
