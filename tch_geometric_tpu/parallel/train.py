"""End-to-end sampled training: sample -> gather -> forward -> backward,
one jitted program, no host round-trip.

This is the path the reference cannot express: its sampler returns host
tensors that a PyTorch DataLoader feeds to PyG (SURVEY §3.1).  Here the
neighbor sampler IS part of the train step — the whole minibatch pipeline
compiles into a single XLA program per step.

Data parallelism: seeds/labels sharded over the mesh 'data' axis; each chip
draws its own counter-based keys (device-count independent, sampling/rng.py)
and XLA inserts the gradient all-reduce.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from ..data.graph import CscGraph
from ..models.sage import GraphSAGE
from ..sampling import rng
from ..sampling.neighbor import _sample_neighbors_impl


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_gnn_trainer(
    model,
    fanouts: Sequence[int],
    *,
    learning_rate: float = 1e-2,
    with_replacement: bool = False,
    window: int = 256,
):
    """Build (init_fn, train_step, eval_step) closures for sampled training
    of any model exposing ``tree_forward(sample, x, deterministic=...)``
    (GraphSAGE, GCN, GAT — models/).

    train_step(state, key, graph, x_table, seeds, labels) -> (state, loss)
    — seeds/labels may be sharded over a mesh 'data' axis; everything inside
    is jit-compiled including the neighbor sampling itself.

    ``with_replacement`` defaults to False (PyG NeighborLoader's default):
    measured on planted-label tasks it is worth ~2.5 accuracy points over
    with-replacement at equal fanouts (duplicate draws raise aggregation
    variance) at identical sampling throughput (lane top-k, BASELINE.md).
    """
    tree_forward = type(model).tree_forward
    fanouts = tuple(int(k) for k in fanouts)
    tx = optax.adam(learning_rate)

    def sample_and_gather(key, graph, x_table, seeds):
        zeros = jnp.zeros((seeds.shape[0],), jnp.int32)
        with jax.named_scope("sample"):
            sample = _sample_neighbors_impl(
                key, graph, seeds.astype(jnp.int32), zeros, None, None,
                fanouts, with_replacement, None, window)
        # No validity mask on the gathered features: invalid slots clip to
        # node 0's (finite) features, and every path from a non-seed slot to
        # a seed logit passes through tree_neighbor_mean's child mask, so
        # seed outputs are identical with or without masking — and the mask
        # costs a full read+write pass over the gathered tensor (measured
        # 0.8 ms/minibatch at products scale, scripts/micro_step_bisect.py).
        with jax.named_scope("gather"):
            x = x_table[jnp.clip(sample.nodes, 0, x_table.shape[0] - 1)]
        return sample, x

    def loss_fn(params, key, graph, x_table, seeds, labels,
                deterministic=True):
        sample, x = sample_and_gather(key, graph, x_table, seeds)
        with jax.named_scope("forward"):
            logits = model.apply(params, sample, x,
                                 deterministic=deterministic,
                                 rngs={"dropout": rng.fold(key, rng.DROPOUT_STREAM)},
                                 method=tree_forward)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        return loss, logits

    def init_fn(key, graph, x_table, seeds):
        sample, x = sample_and_gather(key, graph, x_table, seeds)
        params = model.init(key, sample, x, method=tree_forward)
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state: TrainState, key, graph, x_table, seeds, labels):
        step_key = rng.fold(key, state.step)
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, step_key, graph, x_table, seeds, labels, False)
        with jax.named_scope("update"):
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
        acc = (logits.argmax(-1) == labels).mean()
        return TrainState(params, opt_state, state.step + 1), loss, acc

    @jax.jit
    def eval_step(state: TrainState, key, graph, x_table, seeds, labels):
        loss, logits = loss_fn(state.params, key, graph, x_table, seeds, labels)
        return loss, (logits.argmax(-1) == labels).mean()

    return init_fn, train_step, eval_step


def make_sage_trainer(model: GraphSAGE, fanouts: Sequence[int], **kw):
    """Alias of :func:`make_gnn_trainer` (kept for the original API)."""
    return make_gnn_trainer(model, fanouts, **kw)


def make_multibatch_sage_trainer(
    model: GraphSAGE,
    fanouts: Sequence[int],
    *,
    learning_rate: float = 1e-2,
    with_replacement: bool = False,
    window: int = 256,
):
    """Sampled-SAGE trainer that fuses M minibatches per jitted step.

    Motivation (measured, v5e): XLA gathers at minibatch scale are
    latency-bound — a few hundred thousand random indices cost ~20 ns EACH,
    while multi-million-index gathers amortize far better.  Neighbor
    sampling is parameter-independent, so M minibatches can be sampled
    (vmapped sampler -> M-fold larger fused gathers) and feature-gathered in
    ONE program, followed by a ``lax.scan`` of M sequential
    forward/backward/adam updates.  Batch i uses sampling key
    ``fold(key, step + i)`` — the exact key schedule of M consecutive
    ``make_sage_trainer`` steps, so the optimization trajectory matches the
    single-batch trainer's, at a fraction of the gather latency
    (tests/test_models_train.py asserts the equivalence).

    train_step(state, key, graph, x_table, seeds (M, B), labels (M, B))
      -> (state, losses (M,), accs (M,))
    """
    fanouts = tuple(int(k) for k in fanouts)
    tx = optax.adam(learning_rate)

    def sample_gather_all(key, step, graph, x_table, seeds):
        M = seeds.shape[0]
        # batch i's key == the single-batch trainer's key at step+i
        keys = jax.vmap(lambda i: rng.fold(key, step + i))(jnp.arange(M))
        zeros = jnp.zeros(seeds.shape, jnp.int32)

        def one(k, s, z):
            return _sample_neighbors_impl(
                k, graph, s.astype(jnp.int32), z, None, None,
                fanouts, with_replacement, None, window)

        sample = jax.vmap(one, in_axes=(0, 0, 0))(keys, seeds, zeros)
        # one fused (M * n_total) feature gather; no validity mask — see
        # make_sage_trainer.sample_and_gather (seed logits are invariant,
        # masking costs a full pass over the gathered tensor).
        xg = x_table[jnp.clip(sample.nodes, 0, x_table.shape[0] - 1)]
        return sample, xg, keys

    def one_update(params_opt, key_m, sample_m, x_m, labels_m):
        params, opt_state = params_opt

        def loss_fn(p):
            logits = model.apply(p, sample_m, x_m, deterministic=False,
                                 rngs={"dropout": rng.fold(key_m,
                                                           rng.DROPOUT_STREAM)},
                                 method=GraphSAGE.tree_forward)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels_m).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (logits.argmax(-1) == labels_m).mean()
        return (params, opt_state), (loss, acc)

    def init_fn(key, graph, x_table, seeds):
        sample, xg, _keys = sample_gather_all(key, jnp.zeros((), jnp.int32),
                                              graph, x_table, seeds[None])
        one_sample = jax.tree.map(lambda a: a[0], sample)
        params = model.init(key, one_sample, xg[0],
                            method=GraphSAGE.tree_forward)
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state: TrainState, key, graph, x_table, seeds, labels):
        sample, xg, keys = sample_gather_all(key, state.step, graph,
                                             x_table, seeds)

        def body(carry, inp):
            key_m, sample_m, x_m, labels_m = inp
            carry, out = one_update(carry, key_m, sample_m, x_m, labels_m)
            return carry, out

        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (state.params, state.opt_state), (keys, sample, xg, labels))
        M = seeds.shape[0]
        return (TrainState(params, opt_state, state.step + M),
                losses, accs)

    return init_fn, train_step

