"""Node2Vec skip-gram embeddings trained from on-device random walks.

The reference's walk example feeds its node2vec walks into PyG's ``Node2Vec``
module for the skip-gram loss (examples/random_walk.py:30-38).  Here both
halves are native: the biased walk (sampling/walks.py) and the skip-gram
negative-sampling loss run inside one jitted train step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..data.graph import CsrGraph
from ..sampling import rng
from ..sampling.walks import _random_walk_impl


class Node2Vec(nn.Module):
    """Embedding table + skip-gram objective over walk windows."""

    num_nodes: int
    embedding_dim: int
    context_size: int
    num_negative: int = 1

    def setup(self):
        self.embedding = nn.Embed(self.num_nodes, self.embedding_dim)

    def loss(self, walks: jax.Array, neg: jax.Array) -> jax.Array:
        """walks: (B, L) node ids, -1 padded; neg: (B, W, num_negative)."""
        emb = self.embedding
        B, L = walks.shape
        C = self.context_size
        W = L - C + 1  # windows per walk

        starts = jnp.arange(W)
        win = walks[:, starts[:, None] + jnp.arange(C)[None, :]]  # (B, W, C)
        target = win[:, :, 0]                                     # (B, W)
        context = win[:, :, 1:]                                   # (B, W, C-1)
        valid = jnp.logical_and(target[..., None] >= 0, context >= 0)

        t_emb = emb(jnp.maximum(target, 0))                       # (B, W, D)
        c_emb = emb(jnp.maximum(context, 0))                      # (B, W, C-1, D)
        pos_logit = (t_emb[:, :, None, :] * c_emb).sum(-1)
        pos_loss = -jax.nn.log_sigmoid(pos_logit)
        pos_loss = jnp.where(valid, pos_loss, 0.0).sum() / jnp.maximum(
            valid.sum(), 1)

        n_emb = emb(jnp.maximum(neg, 0))                          # (B, W, K, D)
        nvalid = jnp.logical_and(target[..., None] >= 0, neg >= 0)
        neg_logit = (t_emb[:, :, None, :] * n_emb).sum(-1)
        neg_loss = -jax.nn.log_sigmoid(-neg_logit)
        neg_loss = jnp.where(nvalid, neg_loss, 0.0).sum() / jnp.maximum(
            nvalid.sum(), 1)
        return pos_loss + neg_loss

    def __call__(self, nodes: jax.Array) -> jax.Array:
        return self.embedding(nodes)


class N2VState(NamedTuple):
    params: object
    opt_state: object
    step: jax.Array


def make_node2vec_trainer(
    model: Node2Vec,
    graph: CsrGraph,
    *,
    walk_length: int = 10,
    p: float = 1.0,
    q: float = 1.0,
    learning_rate: float = 0.01,
    num_trials: int = 16,
):
    """(init_fn, train_step): walks sampled on device inside the step."""
    tx = optax.adam(learning_rate)

    def walks_and_negs(key, starts):
        walks = _random_walk_impl(
            rng.fold(key, 0), graph, starts, walk_length,
            jnp.float32(p), jnp.float32(q), num_trials)
        B, L = walks.shape
        W = L - model.context_size + 1
        neg = jax.random.randint(
            rng.fold(key, 1), (B, W, model.num_negative), 0, model.num_nodes)
        return walks, neg

    def loss_fn(params, key, starts):
        walks, neg = walks_and_negs(key, starts)
        return model.apply(params, walks, neg, method=Node2Vec.loss)

    def init_fn(key, starts):
        walks, neg = walks_and_negs(key, starts)
        params = model.init(key, walks, neg, method=Node2Vec.loss)
        return N2VState(params, tx.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state: N2VState, key, starts):
        step_key = rng.fold(key, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, step_key, starts)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return N2VState(params, opt_state, state.step + 1), loss

    return init_fn, train_step
